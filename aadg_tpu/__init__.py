"""aadg_tpu — a TPU-native automatic-augmentation domain-generalization
segmentation framework (JAX / XLA / Pallas / pjit).

Capability-parity rebuild of CRazorback/AADG (IEEE TMI 2022), re-designed for
TPU: on-device fused augmentation, pure-JAX log-domain Sinkhorn diversity
reward, a jitted RL policy-search loop, and data parallelism over an ICI mesh
with cross-replica batch-norm statistics. See SURVEY.md for the structural
map of the reference and PARITY.md for the component-by-component account.
"""

__version__ = "0.1.0"
