"""Compute ops: quantization, distances, scans, top-k, phash, preprocessing."""
