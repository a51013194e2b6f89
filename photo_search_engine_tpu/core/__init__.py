"""Core pipelines: device-resident vector index, keyword index, indexer
(build pipeline + job control), searcher (hybrid retrieval brain).
Reference layer L1+L2 (SURVEY.md §1)."""
