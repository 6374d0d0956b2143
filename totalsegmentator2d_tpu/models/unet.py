"""2D U-Net (nnU-Net PlainConvUNet family) as pure JAX functions.

TPU-first reimplementation of the network the reference runs through
PyTorch/`nnunetv2` (`predict_logits_from_preprocessed_data`,
reference prediction_worker.py:209):

 - NHWC layout (channels-last feeds the MXU's 128-lane minor dimension).
 - Params are a nested dict pytree whose structure mirrors the torch
   state-dict naming (encoder.stages[s].convs[c].conv/norm, decoder
   transpconvs/stages/seg_layers) so checkpoint conversion is mechanical
   (see convert.py) and groups stack cleanly for vmapped ensembles.
 - Conv + InstanceNorm + LeakyReLU per block; InstanceNorm uses batch
   statistics (biased variance) exactly like torch's InstanceNorm2d with
   track_running_stats=False.
 - Decoder: stride-matched transposed convs, skip concat, conv stacks, and
   1x1 seg heads per stage (deep supervision); inference reads the final
   full-resolution head only.

Everything here is shape-static and jit/vmap-safe; ensemble stacking over
folds/groups is a vmap over the params pytree.
"""

from __future__ import annotations

import contextlib
import contextvars
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .plans import ArchSpec

Params = Dict[str, Any]

_DN = ('NHWC', 'HWIO', 'NHWC')


def _conv(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray],
          stride: Tuple[int, int], kernel: Tuple[int, int],
          compute_dtype=None, out_dtype=None) -> jnp.ndarray:
    pad = [((k - 1) // 2, (k - 1) // 2) for k in kernel]
    if compute_dtype is not None:
        # bf16 operands feed the MXU at full rate; accumulation inside the
        # MXU stays fp32 regardless of the stored output dtype
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pad, dimension_numbers=_DN,
        preferred_element_type=out_dtype or jnp.float32)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _conv_transpose(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray],
                    stride: Tuple[int, int], compute_dtype=None,
                    out_dtype=None) -> jnp.ndarray:
    """torch ConvTranspose2d(k=stride, padding=0) equivalent: output spatial
    size = input * stride. Weight layout HWOI + transpose_kernel=True matches
    torch's gradient-of-conv semantics exactly (verified in tests)."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = jax.lax.conv_transpose(
        x, w, strides=stride, padding='VALID', dimension_numbers=_DN,
        transpose_kernel=True, preferred_element_type=out_dtype or jnp.float32)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


_STATS_CTX = contextvars.ContextVar('ts2d_stats_override', default=None)


@contextlib.contextmanager
def stats_override(mode: str):
    """Trace-scoped InstanceNorm statistics form ('1pass' / '2pass'),
    consulted by _one_pass_stats when TS2D_STATS is unset. The ensemble
    engine wraps its batched and quantized-bucket serving programs in
    stats_override('1pass'): those paths are already non-bitwise vs the
    solo exact program (batch-dependent conv scheduling / geometry-as-
    data float arithmetic, the borderline-flip class pinned in
    tests/test_008 and tools/parity.py), so they take the measured 7%
    device win (tools/perf_probe20.py) while the solo exact program —
    the bitwise torch-parity path — stays two-pass."""
    if mode not in ('1pass', '2pass'):
        raise ValueError(f"stats_override must be '1pass' or '2pass', "
                         f"got {mode!r}")
    tok = _STATS_CTX.set(mode)
    try:
        yield
    finally:
        _STATS_CTX.reset(tok)


def _one_pass_stats() -> bool:
    """TS2D_STATS=1pass computes the InstanceNorm variance as
    E[x^2] - E[x]^2 so both reductions ride ONE HBM traversal (XLA fuses
    sibling reductions over the same operand into one multi-output
    fusion) — the two-pass form reads the conv output twice because the
    centered-square reduction depends on the mean. One traversal of six
    per conv-norm-act unit (tools/roofline.py). The subtraction form
    drifts logits ~1e-6 vs the torch-matching two-pass statistics, so
    bitwise-parity paths default to two-pass; serving paths that are
    already non-bitwise opt in per program via stats_override. Setting
    TS2D_STATS explicitly forces one form everywhere (read at trace
    time)."""
    import os
    env = os.environ.get('TS2D_STATS')
    if env is not None:
        if env not in ('1pass', '2pass'):
            raise ValueError(
                f"TS2D_STATS must be '1pass' or '2pass', got {env!r}")
        return env == '1pass'
    return _STATS_CTX.get() == '1pass'


def _instance_norm(x: jnp.ndarray, scale: Optional[jnp.ndarray],
                   bias: Optional[jnp.ndarray], eps: float) -> jnp.ndarray:
    # per-sample, per-channel statistics over spatial dims; biased variance.
    # statistics always accumulate in fp32 (variance over 64k elements in
    # bf16 is garbage); a bf16 input is read once per pass and upcast
    # in-register, so keeping activations bf16 halves the memory traffic
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    if _one_pass_stats():
        # safe here: every conv input is normalized, so mean^2/var ~ O(1)
        # and the fp32 cancellation error is ~1e-7 relative
        var = (jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
               - jnp.square(mean))
        var = jnp.maximum(var, 0.0)
    else:
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def _leaky_relu(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * slope)


def _block(x: jnp.ndarray, p: Params, stride: Tuple[int, int],
           kernel: Tuple[int, int], spec: ArchSpec,
           compute_dtype=None) -> jnp.ndarray:
    """ConvDropoutNormReLU: conv -> InstanceNorm -> LeakyReLU. With a bf16
    compute dtype the activations are also STORED bf16 between ops (the
    wide early stages are memory-bound; norm statistics stay fp32).

    Round-3 measurement (tools/perf_probe10/11.py): the InstanceNorm
    statistics dependency costs ~75% of a block's time at the top stages
    under XLA's schedule. Every Pallas route tried against it LOST
    end-to-end — standalone norm+act kernel (probe3), standalone stats
    reduction / MXU ones-matmul (probe10), and the fused stack
    (_conv_stack_fused: wins isolated, loses 0.69-0.93x inside the real
    program to layout conversions; probe11) — so this standard XLA chain
    remains the production path (docs/performance.md)."""
    x = _conv(x, p['conv']['w'], p['conv'].get('b'), stride, kernel,
              compute_dtype, out_dtype=compute_dtype)
    norm = p.get('norm')
    if norm is None:
        return _leaky_relu(x, spec.nonlin_slope)
    # norm statistics always in fp32 (variance is precision-sensitive)
    x = _instance_norm(x, norm.get('scale'), norm.get('bias'), spec.norm_eps)
    return _leaky_relu(x, spec.nonlin_slope)


def _conv_stack(x: jnp.ndarray, blocks: List[Params], first_stride: Tuple[int, int],
                kernel: Tuple[int, int], spec: ArchSpec,
                compute_dtype=None) -> jnp.ndarray:
    if (fused_blocks_enabled() and len(blocks) > 1
            and tuple(kernel) == (3, 3)
            and compute_dtype == jnp.bfloat16
            and all(p.get('norm') is not None for p in blocks)):
        return _conv_stack_fused(x, blocks, first_stride, spec)
    for i, p in enumerate(blocks):
        x = _block(x, p, first_stride if i == 0 else (1, 1), kernel, spec,
                   compute_dtype)
    return x


def fused_blocks_enabled() -> bool:
    """Gate for the Pallas fused block chain (_conv_stack_fused /
    ops/pallas/fused_block.py). TS2D_FUSED=1 enables (TPU backend only);
    default follows the measured verdict in docs/performance.md."""
    import os
    if os.environ.get('TS2D_FUSED', '0') != '1':
        return False
    import jax
    if jax.default_backend() != 'tpu':
        return False
    dd = getattr(jax.config, 'jax_default_device', None)
    return not (dd is not None and getattr(dd, 'platform', None) == 'cpu')


def _conv_stack_fused(x: jnp.ndarray, blocks: List[Params],
                      first_stride: Tuple[int, int],
                      spec: ArchSpec, interpret: bool = False) -> jnp.ndarray:
    """Fused-chain version of a conv stack: block 0 runs its conv through
    XLA with one-pass statistics; every later block runs the Pallas
    norm+act+conv(+stats) kernel reading the raw previous output once; the
    stack's final normalize+act is one XLA elementwise pass. Removes the
    standalone stats read and normalize read+write of every inner block
    (docs/performance.md round-3 measurements)."""
    from ..ops.pallas.fused_block import fold_stats, fused_norm_act_conv

    cdt = jnp.bfloat16
    p0 = blocks[0]
    b0 = p0['conv'].get('b')
    if b0 is None:
        b0 = jnp.zeros(p0['conv']['w'].shape[-1], jnp.float32)
    if tuple(first_stride) == (1, 1) and x.shape[-1] >= 16:
        # stride-1 first block runs in Pallas too (conv+stats, no input
        # normact): the whole stack stays in the kernel's tiled layout and
        # the stats reduction never touches XLA's slow reduce emitter
        dummy = jnp.zeros((x.shape[0], x.shape[-1]), jnp.float32)
        y, stats = fused_norm_act_conv(x.astype(cdt), dummy, dummy,
                                       p0['conv']['w'], b0,
                                       apply_normact=False,
                                       interpret=interpret)
    else:
        y = _conv(x, p0['conv']['w'], b0, first_stride, (3, 3),
                  cdt, out_dtype=cdt)
        y32 = y.astype(jnp.float32)
        # one pass: both reductions read y once (E[x], E[x^2])
        stats = jnp.stack([jnp.sum(y32, axis=(1, 2)),
                           jnp.sum(jnp.square(y32), axis=(1, 2))], axis=1)
    hw = y.shape[1] * y.shape[2]
    norm = p0['norm']
    for p in blocks[1:]:
        scale, shift = fold_stats(stats, hw, norm.get('scale'),
                                  norm.get('bias'), spec.norm_eps)
        bias = p['conv'].get('b')
        if bias is None:
            bias = jnp.zeros(p['conv']['w'].shape[-1], jnp.float32)
        y, stats = fused_norm_act_conv(y, scale, shift, p['conv']['w'], bias,
                                       slope=spec.nonlin_slope,
                                       interpret=interpret)
        norm = p['norm']
    scale, shift = fold_stats(stats, hw, norm.get('scale'), norm.get('bias'),
                              spec.norm_eps)
    z = y.astype(jnp.float32) * scale[:, None, None, :] \
        + shift[:, None, None, :]
    z = jnp.where(z >= 0, z, z * spec.nonlin_slope)
    return z.astype(cdt)


def forward(params: Params, x: jnp.ndarray, spec: ArchSpec,
            deep_supervision: bool = False, compute_dtype=None,
            head_dtype=None):
    """Run the U-Net. x: (N, H, W, C_in), H/W divisible by the total stride.
    Returns logits (N, H, W, C_out), or a list (highest resolution first)
    when deep_supervision is set. ``compute_dtype=jnp.bfloat16`` runs the
    matmul/conv operands in bf16 (fp32 accumulation + norms) for ~2x MXU
    throughput. ``head_dtype`` sets the seg-head output dtype (default
    fp32 — inference parity); training under bf16 passes bf16 here so the
    head's conv backward sees matching operand/cotangent dtypes, and
    upcasts at the loss."""
    a = spec
    skips = []
    h = x
    for s in range(a.n_stages):
        h = _conv_stack(h, params['encoder']['stages'][s], a.strides[s],
                        a.kernel_sizes[s], a, compute_dtype)
        skips.append(h)

    seg_outputs = []
    h = skips[-1]
    n_dec = a.n_stages - 1
    for d in range(n_dec):
        enc_stage = n_dec - d  # stage whose stride this transpconv undoes
        t = params['decoder']['transpconvs'][d]
        h = _conv_transpose(h, t['w'], t.get('b'), a.strides[enc_stage],
                            compute_dtype, out_dtype=compute_dtype)
        # NOTE: splitting this concat into two convs (conv(cat(h,s),W) ==
        # conv(h,W1)+conv(s,W2)) was measured on v5e and rejected: no
        # speedup (343 -> 340 ms at batch 8 — XLA already schedules the
        # concat well) and the bf16 add reassociation flips ~1% of
        # borderline mask pixels (tools/perf_probe8.py)
        h = jnp.concatenate([h, skips[enc_stage - 1].astype(h.dtype)], axis=-1)
        h = _conv_stack(h, params['decoder']['stages'][d], (1, 1),
                        a.kernel_sizes[enc_stage - 1], a, compute_dtype)
        sl = params['decoder']['seg_layers'][d]
        if deep_supervision or d == n_dec - 1:
            seg_outputs.append(_conv(h, sl['w'], sl.get('b'), (1, 1), (1, 1),
                                     compute_dtype, out_dtype=head_dtype))

    if deep_supervision:
        return seg_outputs[::-1]
    return seg_outputs[-1]


# ---------------------------------------------------------------------------
# initialization (matches torch kaiming defaults closely enough for training;
# inference params come from checkpoint conversion)
# ---------------------------------------------------------------------------

def _he_init(key, shape, fan_in, dtype=jnp.float32):
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


def init_params(key: jax.Array, spec: ArchSpec, dtype=jnp.float32) -> Params:
    a = spec
    keys = iter(jax.random.split(key, 4096))

    def conv_block(cin, cout, kernel):
        kh, kw = kernel
        p = {'conv': {'w': _he_init(next(keys), (kh, kw, cin, cout),
                                    cin * kh * kw, dtype)}}
        if a.conv_bias:
            p['conv']['b'] = jnp.zeros((cout,), dtype)
        if a.norm_affine:
            p['norm'] = {'scale': jnp.ones((cout,), dtype),
                         'bias': jnp.zeros((cout,), dtype)}
        return p

    enc_stages = []
    cin = a.in_channels
    for s in range(a.n_stages):
        blocks = []
        for c in range(a.n_conv_per_stage[s]):
            blocks.append(conv_block(cin if c == 0 else a.features_per_stage[s],
                                     a.features_per_stage[s], a.kernel_sizes[s]))
        enc_stages.append(blocks)
        cin = a.features_per_stage[s]

    transpconvs, dec_stages, seg_layers = [], [], []
    n_dec = a.n_stages - 1
    for d in range(n_dec):
        enc_stage = n_dec - d
        cin_below = a.features_per_stage[enc_stage]
        cskip = a.features_per_stage[enc_stage - 1]
        sh, sw = a.strides[enc_stage]
        t = {'w': _he_init(next(keys), (sh, sw, cskip, cin_below),  # HWOI
                           cin_below * sh * sw, dtype)}
        t['b'] = jnp.zeros((cskip,), dtype)
        transpconvs.append(t)
        blocks = []
        for c in range(a.n_conv_per_stage_decoder[d]):
            blocks.append(conv_block(2 * cskip if c == 0 else cskip, cskip,
                                     a.kernel_sizes[enc_stage - 1]))
        dec_stages.append(blocks)
        seg = {'w': _he_init(next(keys), (1, 1, cskip, a.out_channels), cskip, dtype),
               'b': jnp.zeros((a.out_channels,), dtype)}
        seg_layers.append(seg)

    return {'encoder': {'stages': enc_stages},
            'decoder': {'transpconvs': transpconvs, 'stages': dec_stages,
                        'seg_layers': seg_layers}}


def init_params_np(seed: int, spec: ArchSpec, dtype=np.float32) -> Params:
    """Host-side (numpy) initializer with the same pytree layout and
    semantics as init_params (He conv weights, zero biases, unit norm
    scales). Use when the accelerator has high per-op dispatch latency —
    device-side init issues one op per leaf — or when params are immediately
    re-stacked on host anyway."""
    a = spec
    rng = np.random.default_rng(seed)

    def he(shape, fan_in):
        return (rng.standard_normal(shape) * math.sqrt(2.0 / fan_in)).astype(dtype)

    def conv_block(cin, cout, kernel):
        kh, kw = kernel
        p = {'conv': {'w': he((kh, kw, cin, cout), cin * kh * kw)}}
        if a.conv_bias:
            p['conv']['b'] = np.zeros((cout,), dtype)
        if a.norm_affine:
            p['norm'] = {'scale': np.ones((cout,), dtype),
                         'bias': np.zeros((cout,), dtype)}
        return p

    enc_stages = []
    cin = a.in_channels
    for s in range(a.n_stages):
        blocks = [conv_block(cin if c == 0 else a.features_per_stage[s],
                             a.features_per_stage[s], a.kernel_sizes[s])
                  for c in range(a.n_conv_per_stage[s])]
        enc_stages.append(blocks)
        cin = a.features_per_stage[s]

    transpconvs, dec_stages, seg_layers = [], [], []
    n_dec = a.n_stages - 1
    for d in range(n_dec):
        enc_stage = n_dec - d
        cin_below = a.features_per_stage[enc_stage]
        cskip = a.features_per_stage[enc_stage - 1]
        sh, sw = a.strides[enc_stage]
        transpconvs.append({'w': he((sh, sw, cskip, cin_below),  # HWOI
                                    cin_below * sh * sw),
                            'b': np.zeros((cskip,), dtype)})
        dec_stages.append([conv_block(2 * cskip if c == 0 else cskip, cskip,
                                      a.kernel_sizes[enc_stage - 1])
                           for c in range(a.n_conv_per_stage_decoder[d])])
        seg_layers.append({'w': he((1, 1, cskip, a.out_channels), cskip),
                           'b': np.zeros((a.out_channels,), dtype)})

    return {'encoder': {'stages': enc_stages},
            'decoder': {'transpconvs': transpconvs, 'stages': dec_stages,
                        'seg_layers': seg_layers}}


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def pad_to_stride(shape: Sequence[int], total_stride: Sequence[int],
                  patch_size: Sequence[int]) -> Tuple[int, ...]:
    """Smallest spatial shape >= max(shape, patch) divisible by the stride."""
    out = []
    for n, s, p in zip(shape, total_stride, patch_size):
        n = max(int(n), int(p))
        out.append(int(math.ceil(n / s) * s))
    return tuple(out)
