"""flashgmm_tpu: a TPU-native learned image-compression framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of FlashGMM
(a CompressAI fork): VAE compression models, compositional latent codecs,
fast Gaussian-mixture entropy coding with search-based decoding, and a
rANS entropy coder whose probability math runs on TPU.

Entropy-coder registry mirrors the reference API
(/root/reference/compressai/__init__.py:50-90).
"""

from flashgmm_tpu import (  # noqa: F401
    datasets,
    entropy_models,
    latent_codecs,
    layers,
    losses,
    models,
    ops,
    optimizers,
    registry,
    transforms,
    zoo,
)

__version__ = "0.1.0"

_entropy_coder = "rans"
_available_entropy_coders = ["rans", "rangecoder"]


def set_entropy_coder(entropy_coder: str) -> None:
    """Specifies the default entropy coder used to encode the bit-streams.

    Args:
        entropy_coder: name of the entropy coder
    """
    global _entropy_coder
    if not isinstance(entropy_coder, str):
        raise ValueError(f'Invalid entropy coder type "{type(entropy_coder)}"')
    if entropy_coder not in _available_entropy_coders:
        raise ValueError(
            f'Invalid entropy coder "{entropy_coder}", choose from '
            f"({', '.join(_available_entropy_coders)})."
        )
    _entropy_coder = entropy_coder


def get_entropy_coder() -> str:
    """Return the name of the default entropy coder used to encode the
    bit-streams."""
    return _entropy_coder


def available_entropy_coders():
    """Return the list of available entropy coders."""
    return _available_entropy_coders
