"""BIOSCAN-CLIP-TPU: a TPU-native (JAX/XLA/Pallas/pjit) multimodal contrastive
learning framework with the capabilities of bioscan-ml/bioscan-clip.

Tri-modal CLIP-style alignment of insect images (ViT-B/16), DNA barcodes
(BarcodeBERT, 5-mer tokenized) and taxonomic text labels (BERT-small) in a
shared 768-d embedding space, with retrieval-as-classification evaluation.

Design: functional Flax models, one `jax.sharding.Mesh`, gather-with-grad
global-batch InfoNCE over ICI, on-TPU exact top-k retrieval (Pallas), orbax
checkpointing, and a host->device streaming HDF5 data pipeline.

Reference parity: see SURVEY.md; component docstrings cite reference
file:line locations for behavioral parity checks.
"""

__version__ = "0.1.0"
