"""Shared utilities: spatial extraction, pair sampling."""
