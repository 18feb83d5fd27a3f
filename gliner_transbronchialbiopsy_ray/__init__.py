"""gliner_transbronchialbiopsy_ray — a Ray-Data-native knowledge-graph
construction engine, built from scratch with the query/data-processing
capabilities of drci-foch/GLiner-TransbronchialBiopsy (reference at
/root/reference, studied for behavior only).

Architecture: every stage is a ``ray.data.Dataset`` batch transform over
zero-copy Arrow batches; stateful stages (NER scorer, entity linker) are
actor pools; wide steps (canonicalization clustering, triple dedup, stats)
are groupby/aggregate with pre-aggregation and salting.  See SURVEY.md for
the operator-by-operator mapping.
"""

__version__ = "0.1.0"
