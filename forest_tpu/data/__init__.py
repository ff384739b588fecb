"""Host-side data pipeline: zarr-lite IO, splits, samplers, schema, features."""
