"""Sources: deterministic synthetic CDC data + testdata table readers."""
