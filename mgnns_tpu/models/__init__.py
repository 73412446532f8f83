"""Model assemblies: the MGNNS fusion model and the text-only slice."""

from mgnns_tpu.models.mgnns import mgnns_init, mgnns_apply
from mgnns_tpu.models.text_only import text_model_init, text_model_apply

__all__ = ["mgnns_init", "mgnns_apply", "text_model_init", "text_model_apply"]
