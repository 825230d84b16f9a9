"""Standalone codec export (TPU-framework analog of the reference's SADL
codec pipeline, compressai/sadl_codec/).

Exports a trained factorized-prior model (e.g. ``bmshj2018-factorized`` /
``bmshj2018-factorized-relu``) to a self-contained binary "model card"
consumed by the pure-C++ encoder/decoder in ``csrc/standalone/``
(built via ``make standalone`` -> ``build/fgsc_encode``,
``build/fgsc_decode``): no Python, JAX, or TPU at runtime.

- :mod:`.export` writes the model card (g_a/g_s layer stacks, the
  EntropyBottleneck's quantized CDF tables, per-channel synthesis gains
  for the encoder's RDOQ).
- :mod:`.format` is the byte-compatible Python twin of the C++ bitstream
  (encode/decode through the JAX model + host coder) used for interop
  tests and as a pure-Python fallback.
"""

from .export import export_model_card, synthesis_gains
from .format import decode_bitstream, encode_bitstream

__all__ = [
    "export_model_card",
    "synthesis_gains",
    "encode_bitstream",
    "decode_bitstream",
]
