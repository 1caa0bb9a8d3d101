"""Sources: file-corpus scans (binary/multimodal) and text parsing."""
