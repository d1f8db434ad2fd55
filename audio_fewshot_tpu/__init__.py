"""audio_fewshot_tpu — TPU-native few-shot audio-classification framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
Jerryaa98/Audio-Fewshot reference (an audio-adapted LibFewShot fork):
few-shot learning over log-mel spectrogram episodes with variable-length
clip aggregation ("repeats"), energy-based OOD detection, and test-time
augmentation — expressed as pure functional transforms over dense, masked
episode batches, vmapped over episodes and sharded over TPU meshes.

Layer map (mirrors reference SURVEY §1, re-architected for XLA):
  config      — YAML + includes + var_dict merge (reference: libfewshot_core/config, missing pkg)
  data        — episodic sampler + dense masked EpisodeBatch collate (reference: libfewshot_core/data)
  models      — backbones (flax) + method heads (pure fns) (reference: libfewshot_core/model/**)
  ops         — Pallas/XLA kernels: BDC pool, log-mel, TTA augments (reference: python loops)
  parallel    — Mesh/pjit episode sharding (reference: torch DDP/NCCL)
  utils       — meters, logging, checkpointing, seeding, aggregation
"""

__version__ = "0.1.0"
