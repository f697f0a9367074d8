"""Query corpus modules. Importing a module registers its queries
(see ..registry). Modules map 1:1 to SURVEY.md §2 sections:

  relational.py        §2.G relational/analytics surface
  smt_queries.py       §2.D single-message transforms
  sources_queries.py   §2.A source modes
  sinks_queries.py     §2.B sink semantics (+ §2.C serde queries)
  streaming_queries.py §2.F batch-equivalents of streaming semantics
  udf_queries.py       §2.H UDF/UDAF/UDTF surface
  llm.py               §2.I dedup / similarity / embeddings
  text_queries.py      §2.I text analysis (lang-id, quality, tokens)
"""
