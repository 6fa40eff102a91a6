"""inverse_audio_synthesis_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of turian/inverse-audio-synthesis.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

- ``synth``    — L0: pure-functional torchsynth-Voice-equivalent synthesizer.
                 Data is born on-device from integer batch numbers.
- ``ops``      — L1: DSP ops (PQMF filterbank, STFT/mel, byte scaling) compiled to
                 XLA; ``ops.pallas`` holds hand-fused TPU kernels for the hot paths.
- ``models``   — L2: towers (AudioEmbedding, ParamEmbed, MobileNetV3-small, VICReg
                 projector + loss, inverse-synthesis head), all Flax.
- ``train``    — L3/L4: task modules (pretrain/downstream), jit-compiled train loop,
                 optimizers (LARS + warmup-cosine), orbax checkpointing.
- ``parallel`` — device mesh + sharding rules (GSPMD: batch over the ``data`` axis,
                 optional tensor parallelism for the projector over ``model``).
- ``eval``     — L6: heareval-style embedding API, NN-retrieval evaluation.
- ``utils``    — L5: config tree (hydra-like YAML composition), metrics logging,
                 audio IO.
"""

__version__ = "0.1.0"
