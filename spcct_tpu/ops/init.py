# init.py — torch-style parameter initializers for training-dynamics parity.
#
# The reference relies on torch defaults: Conv3d/Linear weights are
# kaiming_uniform(a=sqrt(5)) — i.e. Uniform(±sqrt(1/fan_in)) — and biases are
# Uniform(±1/sqrt(fan_in)). Flax defaults (lecun_normal) have different scale;
# we reproduce the torch distribution so per-seed training curves stay in the
# same regime (SURVEY.md §7 "numerical parity" hard-part #2).
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

# Uniform(±sqrt(1/fan_in)): variance_scaling gives var = scale/fan_in;
# uniform(-b, b) has var b^2/3, so scale=1/3 → b = sqrt(1/fan_in).
torch_conv_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")
torch_linear_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """Uniform(±1/sqrt(fan_in)) bias initializer, torch Conv/Linear default."""
    bound = 1.0 / np.sqrt(max(1, fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
