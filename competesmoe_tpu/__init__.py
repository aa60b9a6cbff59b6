"""competesmoe_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Mixture-of-Experts
routing-algorithm framework with the capabilities of Fsoft-AIC/CompeteSMoE.

Sub-packages
------------
ops       Kernel-level primitives: top-k routing, grouped expert GEMMs
          (dense / ragged_dot / Pallas), auxiliary losses.
moe       The routing-algorithm zoo (SMoE, XMoE, perturbed-cosine, sigmoid
          gating, SharedE-V2/V3, DeepSeek-V2/V3, CompeteSMoE) for both the
          "multimodal" (2-layer GELU experts) and "pretrain" (MoEUT-style
          keys/values) expert parameterizations, plus the CompeteSMoE
          flip-schedule generator.
models    Transformer language model (RoPE, pre-LN, MoE FFN) and the
          multimodal (SigLIP MoE tower + MoE projector + decoder) stack.
parallel  Device-mesh construction and sharding rules (data / expert axes).
train     Training loops, optimizers, checkpointing, logging.
data      Token-chunk datasets and batching.
"""

__version__ = "0.1.0"
