"""Evaluation & inference tools: codebook export, embeddings, probes, GMM."""
