"""countdetr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for few-shot
object counting and detection, with the capabilities of
VinAIResearch/Counting-DETR (ECCV 2022, arXiv 2207.10988).

The reference implements a two-stage pipeline (reference README.md:11-15):
  stage 1: regress pseudo ground-truth (w, h) for each dot annotation from
           3 exemplar boxes (reference CountDETR_147_1st_stage/engine.py:123-187);
  stage 2: train an uncertainty-aware AnchorDETR detector on those pseudo boxes
           (reference CountDETR_147_2nd_stage/models/anchor_detr.py:264-289).

This package is ONE codebase: the four vendored reference trees
(147/lvis x stage1/stage2) collapse into configuration (see config.py).
Everything in the compute path is jit-compiled JAX with fixed shapes; the
scipy CPU Hungarian matcher becomes a batched on-device auction solver
(ops/matching.py); RCDA attention has a fused Pallas TPU kernel (ops/pallas/).
"""

__version__ = "0.1.0"
