"""styletts2_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-design of StyleTTS2-lite.

A complete text-to-speech framework with the capabilities of
thewh1teagle/StyleTTS2-lite (reference mounted at /root/reference), built
TPU-first rather than ported:

* all DSP (mel/STFT/iSTFT/MFCC) is formulated as MXU matmuls (with Pallas
  kernels for the fused hot paths) instead of torchaudio calls,
* recurrent stacks are mask-aware `lax.scan` bi-LSTMs with static shapes
  instead of `pack_padded_sequence`,
* the monotonic-alignment Viterbi DP runs on-device via `lax.scan`
  (the reference round-trips GPU->CPU-Cython->GPU per step),
* training is data-parallel over a `jax.sharding.Mesh` (the reference uses
  single-process `torch.nn.DataParallel`),
* everything is functional: params are pytrees, PRNG keys are explicit.

Layer map mirrors SURVEY.md section 1; see each module's docstring for the
reference file:line citations it provides parity with.
"""

__version__ = "0.1.0"

from styletts2_tpu.config import Config, load_config, ModelConfig  # noqa: F401
from styletts2_tpu.text import TextCleaner, build_symbol_dict  # noqa: F401
