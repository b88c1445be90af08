"""MVulD-TPU: a TPU-native multi-modal vulnerability-detection framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of MVulD
(jacknichao/MVulD): function-level C/C++ vulnerability detection by fusing
three modalities of the same function —

  * text  — a UniXcoder (RoBERTa) sentence embedding plus per-line node
            embeddings (reference: mvuld/models/unixcoder.py),
  * graph — a code-property-graph (one node per source line, AST/CFG/CDG
            edges) processed by GAT + Rs-GCN relational reasoning
            (reference: mvuld/models/GraphModel.py:81-211),
  * image — the graph rendered to a PNG, encoded by SwinV2-Base 448 with
            OCR-recovered per-node bounding boxes as positional features
            (reference: mvuld/models/swin_transformer_v2.py, OCR/).

Unlike the reference (torch/CUDA/DDP, staged through on-disk caches), this
framework is TPU-first: static shapes, dense masked graph ops, bf16 on the
MXU, Pallas window-attention kernels, and `jax.sharding`/`shard_map` data
parallelism over an ICI mesh.
"""

__version__ = "0.1.0"
