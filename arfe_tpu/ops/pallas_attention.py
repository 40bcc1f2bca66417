"""Fused NonLocal (AR-FPN) attention Pallas kernel.

The north-star names the AR-FPN per-level attention as a hand-written
kernel (BASELINE.json). XLA's lowering materializes the (HW, HW) pairwise
matrix in HBM twice (QK^T out, softmax in/out, PV in); at AR-FPN's token
counts (2k-8k) the whole K/V fits VMEM, so this kernel computes
softmax(QK^T * scale) @ V per query block with the pairwise tile living
only in VMEM — one HBM pass over Q/K/V/out.

Falls back to the XLA einsum path when shapes don't fit the VMEM budget or
off-TPU.

Accuracy note (measured on v5e): this kernel computes both matmuls with
f32 accumulation (preferred_element_type) for every batch size; the XLA
einsum formulation drops to single-pass-bf16 matmul precision for some
batched shapes under the default TPU matmul precision (observed 1.2e-2
max deviation at b=8, n=1050/4200 vs 5e-7 at b=1). The kernel is the
MORE accurate path as well as the faster one. Operands stay in their
input dtype inside the kernel (bf16 MXU products are exact; only the
softmax probabilities are quantized to the value dtype before the PV
matmul — same as the XLA path), which halves the K/V VMEM footprint and
lets the flagship's 4200-token refine level fit without falling back.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom of the ~16MB VMEM


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid):
    # Keep q/k/v in their input dtype: for bf16 operands the MXU multiplies
    # exactly (8-bit mantissas -> <=16-bit products) and accumulates f32 via
    # preferred_element_type, so materializing f32 VMEM copies of K/V (which
    # doubled the footprint and forced an XLA fallback at the flagship's
    # 4200-token refine level) adds no precision.
    q = q_ref[0]                                     # (BQ, C)
    k = k_ref[0]                                     # (N, C)
    v = v_ref[0]                                     # (N, C)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if scale is not None:
        s = s * scale
    n = k.shape[0]
    if n_valid < n:  # padded keys never receive probability mass
        mask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < n_valid
        s = jnp.where(mask, s, -jnp.inf)
    s = s - s.max(axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pick_bq(n, c, in_bytes):
    """Largest query-block size whose working set fits the VMEM budget
    (q/out double-buffered across grid steps; K/V fetched once; the f32
    pairwise tile counted twice to cover exp/normalize temporaries)."""
    for bq in (512, 256, 128, 64):
        n_pad = -(-n // bq) * bq
        need = (2 * bq * c * in_bytes + 2 * n_pad * c * in_bytes
                + 2 * bq * n_pad * 4 + 2 * bq * c * 4)
        if need <= VMEM_BUDGET:
            return bq
    return None


def fused_softmax_attention(q, k, v, scale=None):
    """softmax(q @ k^T * scale) @ v, fused on TPU.

    Args:
        q, k, v: (B, N, C). Returns (B, N, C) float32.
    """
    b, n, c = q.shape
    on_tpu = jax.default_backend() == 'tpu'
    BQ = _pick_bq(n, c, q.dtype.itemsize) if on_tpu else None
    if not (on_tpu and c % 128 == 0 and BQ is not None):
        s = jnp.einsum('nqc,nkc->nqk', q, k,
                       preferred_element_type=jnp.float32)
        if scale is not None:
            s = s * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum('nqk,nkc->nqc', p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)

    n_pad = -(-n // BQ) * BQ
    pad = n_pad - n
    if pad:
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    else:
        qp, kp, vp = q, k, v

    kernel = functools.partial(_kernel, scale=scale, n_valid=n)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_pad // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, c), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, c), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
    )(qp, kp, vp)
    return out[:, :n]


def _xla_attention(q, k, v, scale):
    s = jnp.einsum('nqc,nkc->nqk', q, k,
                   preferred_element_type=jnp.float32)
    if scale is not None:
        s = s * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum('nqk,nkc->nqc', p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def attention_auto(q, k, v, scale=None):
    """Pallas-fused forward + XLA-derived backward (the ops/pallas pattern
    used by roi_align_auto)."""
    return fused_softmax_attention(q, k, v, scale)


def _att_fwd(q, k, v, scale):
    return attention_auto(q, k, v, scale), (q, k, v)


def _att_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


attention_auto.defvjp(_att_fwd, _att_bwd)
