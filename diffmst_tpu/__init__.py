"""diffmst_tpu — TPU-native differentiable mixing style transfer framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Diff-MST
(sai-soum/Diff-MST, ISMIR 2024): a differentiable multitrack mixing console
(gain, 6-band parametric EQ, feed-forward compressor, constant-power panner,
FX-bus reverb, master bus), neural parameter-prediction models (spectrogram
CNN encoders + transformer controller), audio-domain losses (MRSTFT,
audio-feature loss), and the two training methods from the paper.

Design stance (TPU-first):
  * every DSP op is a pure, jit/vmap-clean function over static shapes;
  * IIR filtering uses the frequency-sampling method (batched FFTs on the VPU);
  * compressor ballistics are a first-order linear recurrence evaluated with
    an associative scan (or the reference-compatible one-pole FSM smoother);
  * parallelism is expressed with `jax.sharding.Mesh` + NamedSharding; data
    parallel over the batch axis rides ICI, the flattened batch*track axis is
    the secondary sharding axis.

Layer map (mirrors SURVEY.md §1 of the reference analysis):
  ops/       L0 DSP primitives (replaces the dasp-pytorch dependency)
  console/   L1 Basic/Advanced mix consoles
  mixing/    L2 reference-mix generators (naive random, knowledge engineering)
  models/    L3 neural models (Cnn14, SpectrogramEncoder, TransformerController, ...)
  train/     L4 training systems (System, ParameterEstimationSystem)
  losses/    L5 MRSTFT + AudioFeatureLoss + bark filterbank
  data/      L6 multitrack data pipeline (RAM buffer, LUFS normalization)
  utils/     L7/L9 config registry, inference (run_diffmst), checkpoints
  callbacks/ L8 observability
  parallel/  device mesh + sharding rules
  kernels/   Pallas TPU kernels for the hot ops
"""

__version__ = "0.1.0"

from diffmst_tpu import ops  # noqa: F401
