"""Recurrent cells for the ECC-RNN: GRU/LSTM extended with row instance-norm on
gate pre-activations and a learned input gate.

Behavioral spec (reference learning/modules.py:205-316, GRUCellEx/LSTMCellEx):
  * ingate: input <- sigmoid(Linear_h->in(h)) * input
  * GRU: gi = x W_ih^T, gh = h W_hh^T are instance-normalized (per row over the
    full 3H axis, eps 1e-5, no affine) BEFORE the chunked biases are added;
    gates r,z,n as standard GRU; hy = n + z*(h - n).
  * LSTM: biases are added before normalization (modules.py:299-300), gates
    i,f,g,o from gi+gh.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .norm import instance_norm_row


class GRUCellEx(nn.Module):
    hidden_size: int
    layernorm: bool = True
    ingate: bool = True

    @nn.compact
    def __call__(self, x, h):
        hs = self.hidden_size
        if self.ingate:
            ig = nn.Dense(x.shape[-1], use_bias=True, name="ig")(h)
            x = nn.sigmoid(ig) * x

        gi = nn.Dense(3 * hs, use_bias=False, name="ih")(x)
        gh = nn.Dense(3 * hs, use_bias=False, name="hh")(h)
        if self.layernorm:
            gi = instance_norm_row(gi)
            gh = instance_norm_row(gh)
        bih = self.param("bias_ih", nn.initializers.zeros, (3 * hs,))
        bhh = self.param("bias_hh", nn.initializers.zeros, (3 * hs,))
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        b_ir, b_iz, b_in = jnp.split(bih, 3)
        b_hr, b_hz, b_hn = jnp.split(bhh, 3)

        r = nn.sigmoid(i_r + b_ir + h_r + b_hr)
        z = nn.sigmoid(i_z + b_iz + h_z + b_hz)
        n = jnp.tanh(i_n + b_in + r * (h_n + b_hn))
        return n + z * (h - n)


class LSTMCellEx(nn.Module):
    hidden_size: int
    layernorm: bool = True
    ingate: bool = True

    @nn.compact
    def __call__(self, x, hc):
        h, c = hc
        hs = self.hidden_size
        if self.ingate:
            ig = nn.Dense(x.shape[-1], use_bias=True, name="ig")(h)
            x = nn.sigmoid(ig) * x

        gi = nn.Dense(4 * hs, use_bias=True, name="ih")(x)
        gh = nn.Dense(4 * hs, use_bias=True, name="hh")(h)
        if self.layernorm:
            gi = instance_norm_row(gi)
            gh = instance_norm_row(gh)
        i, f, g, o = jnp.split(gi + gh, 4, axis=-1)
        i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
        g = jnp.tanh(g)
        cy = f * c + i * g
        hy = o * jnp.tanh(cy)
        return hy, cy
