"""Model registry.

Keeps the reference's "one model name keys everything" plugin convention
(reference src/model/__init__.py:17-22) but with an explicit dict instead of
importlib string assembly.
"""

from nlspn_eccv20_tpu.models.nlspn import NLSPNModel  # noqa: F401

_MODELS = {"NLSPN": NLSPNModel}


def get_model(cfg):
    if cfg.model_name not in _MODELS:
        raise NotImplementedError(f"unknown model {cfg.model_name}")
    return _MODELS[cfg.model_name](cfg=cfg)
