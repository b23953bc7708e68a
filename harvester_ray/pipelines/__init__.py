"""End-to-end pipelines: flagship transcript index build/query + relational
operator coverage over the TPC-H-ish test tables."""
