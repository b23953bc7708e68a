"""Source-plugin protocol: declarative OBJECTIVE extractors + paged readers."""
