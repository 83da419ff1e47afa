"""Console tools: auromat-tpu-download and auromat-tpu-convert."""
