"""Dataset stages: fetch actor pools, parse/detect/document transforms,
candidate extraction, dedup, image decoding."""
