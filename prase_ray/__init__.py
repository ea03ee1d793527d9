"""prase_ray — a Ray-Data-native knowledge-graph construction engine.

Re-implements the query/data-processing capabilities of
qizhyuan/PRASE-Python (reference: /root/reference) as idiomatic Ray Data
pipelines: ``ray.data.Dataset`` → ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages, groupby/aggregate for the wide
steps — NOT a port of the reference's in-memory pointer-graph engine.

Layers
------
- ``functions``  : vectorized scalar kernels (normalizers, hashing, text)
- ``sources``    : readers (TSV triples, links, embeddings, web pages)
- ``stages``     : Dataset→Dataset operators (KG build, PARIS iteration,
                   dedup, ANN, windows, extraction)
- ``pipelines``  : end-to-end drivers (PRASE loop, web→KG flagship)
- ``state``      : alignment state + checkpoint/lineage manifests
"""

from prase_ray.config import PrasConfig

__all__ = ["PrasConfig"]
__version__ = "0.1.0"
