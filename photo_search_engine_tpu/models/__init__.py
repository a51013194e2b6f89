"""On-device models: the deterministic hashing text embedder (offline
embedding backend + test oracle) and, at scale, the IVF coarse quantizer.
The reference delegates all model compute to external HTTP endpoints
(SURVEY.md §5 long-context note); this package is where the TPU-native
build keeps model compute local instead."""
