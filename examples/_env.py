"""Shared example bootstrap: repo-root import path + optional CPU mode.

Import this FIRST in every example (before flashpca_tpu / jax usage):

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import _env  # noqa: F401

With FLASHPCA_FORCE_CPU=1 the examples run on CPU in float64 (useful on
machines without the TPU tunnel); the override must happen after the
jax import because the environment's sitecustomize force-registers the
TPU backend (see .claude/skills/verify/SKILL.md).
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("FLASHPCA_FORCE_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
