"""sociallink_ray — a from-scratch, Ray-Data-native knowledge-graph
construction engine with the query/data-processing capabilities of
Remper/sociallink (reference at /root/reference, studied for semantics
only; architecture is idiomatic Ray Data, not a port).

Layout
------
functions/   pure, engine-agnostic kernels (text normalization, name
             compilation, string similarity, minhash/simhash, text stats)
stages/      Ray Data stage builders: ``map_batches`` callables / actor
             classes and groupby-aggregate compositions
sources/     readers/writers (parquet stage dirs, NTriples rendering)
pipelines/   end-to-end pipelines (flagship: pages -> triples)
state/       checkpoint manifests / lineage
fixtures.py  deterministic synthetic corpus generator (input_hint shape)
queries.py   driver-facing queries()/oracle_sql() catalog over testdata
"""

__version__ = "0.1.0"
