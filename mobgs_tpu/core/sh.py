"""Spherical-harmonic color helpers (parity: `utils/sh_utils.py:107-117`)."""

import jax.numpy as jnp

C0 = 0.28209479177387814


def rgb_to_sh(rgb):
    return (rgb - 0.5) / C0


def sh_to_rgb(sh):
    return sh * C0 + 0.5
