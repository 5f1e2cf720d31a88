"""chamjax — TPU-native RAG acceleration framework.

A ground-up rebuild of the capabilities of Chameleon-RAG-Acceleration
(VLDB'25, arXiv 2310.09949) designed TPU-first:

- ``chamjax.index``   — IVF-PQ index training (jitted Lloyd k-means, PQ/OPQ
  codebooks) and the packed, padded, mesh-shardable inverted-list layout
  (the TPU analogue of the reference FPGA's 4-DRAM-bank layout,
  cf. reference ``Faiss_experiments/my_faiss_extract_scripts``).
- ``chamjax.ops``     — the query path: coarse scan, ADC LUT construction,
  XLA + Pallas list-scan kernels, top-k selection
  (cf. reference ``retrieval_accelerator/*/src/vadd.cpp`` dataflow).
- ``chamjax.parallel``— mesh sharding of inverted lists + collective top-k
  merge (cf. reference multi-FPGA sharding + coordinator round-robin).
- ``chamjax.models``  — JAX transformers with explicit KV caches
  (cf. reference fairseq fork's used surface).
- ``chamjax.serving`` — RALM generation loops incl. the tik-tok two-batch
  scheduler (cf. reference ``ralm/ralm/ralm_tiktok.py``).
- ``chamjax.retrieval`` — retriever interface, wire format, TCP service
  mesh (clients/servers/coordinator)
  (cf. reference ``ralm/{retriever,server,coordinator}``).
- ``chamjax.eval``    — recall/QPS/latency benchmarking + IR-quality metrics
  (cf. reference ``Faiss_experiments`` + ``beir``).
"""

__version__ = "0.1.0"

from chamjax import config as config  # noqa: F401
