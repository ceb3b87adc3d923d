"""Pipeline parallelism: microbatched stage execution over a "pipe" mesh
axis (GPipe schedule), net-new over the reference (which is single-GPU
only; its LM trainer is train_music_lstm_v2.py).

TPU-first design: the schedule is one `lax.scan` over pipeline ticks
inside a single `shard_map` — no per-stage Python dispatch, no host
synchronization. Each device holds ONE stage's parameters (a leading
stage axis sharded over the pipe axis); activations hop stages through
`lax.ppermute` (ICI neighbor exchange), the canonical JAX pipelining
pattern. The whole thing jits into one XLA program, composes with the
other mesh axes (data/model/seq — parallel/mesh.py), and is fully
differentiable (ppermute transposes to the reverse permutation), so
`jax.grad` of a pipelined forward is the pipelined backward.

Homogeneity: a scanned schedule needs every stage to share in/out
activation shapes and a common param-tree structure. Stages whose
logical widths differ (the token LM's first layer eats emb_dim=512,
later layers lstm_hid=1024 — models/music_lstm.py) are zero-padded to
the max width: padded weight rows multiply padded (zero) input features,
so the results are EXACTLY the unpadded ones, not an approximation
(pinned by tests/test_pipeline.py against the plain forward, values and
grads).

Cost model: with S stages and M microbatches the bubble fraction is
(S-1)/(M+S-1); inputs are replicated (cheap — tokens/embeddings), and
every device computes every tick (bubble ticks compute on zeros and are
masked out of the result), which keeps the schedule compiler-friendly
(static shapes, no data-dependent control flow).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _varying(x, axis: str):
    """Mark an (invariant) array as device-varying over `axis` for the
    shard_map varying-manifest type system: scan carries that become
    varying in the loop body must START varying. No-op data-wise."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis, to="varying")
    if hasattr(jax.lax, "pvary"):  # pragma: no cover - older jax
        return jax.lax.pvary(x, axis)
    return x  # pragma: no cover - oldest jax (check_rep era)


def pipeline_map(
    stage_fn: Callable,
    stage_params,
    xs: jax.Array,
    mesh: Mesh,
    axis: str = "pipe",
):
    """Run `xs` microbatches through S sequential stages, pipelined.

    stage_fn: (params_slice, x (mb, ...)) -> y with x's shape — one
        stage's compute. Must be shape-preserving (pad widths to make it
        so; see module docstring).
    stage_params: pytree whose leaves have a leading stage axis of size
        S == mesh.shape[axis]; leaf i holds stage i's parameters.
    xs: (M, mb, ...) microbatched input, replicated over the mesh.
    Returns (M, mb, ...): the last stage's outputs, replicated.
    """
    n_stages = mesh.shape[axis]
    n_micro = xs.shape[0]
    ticks = n_micro + n_stages - 1
    pspec = jax.tree_util.tree_map(lambda _: P(axis), stage_params)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(pspec, P()), out_specs=P(),
    )
    def run(params, xs):
        # my stage's params: drop the sharded leading axis of size 1
        mine = jax.tree_util.tree_map(lambda a: a[0], params)
        stage = jax.lax.axis_index(axis)
        perm = [(j, j + 1) for j in range(n_stages - 1)]

        def tick(carry, t):
            recv, outs = carry
            # stage 0 reads the microbatch feed; stage i>0 reads what
            # stage i-1 sent last tick. Bubble ticks see zeros; their
            # results are masked out below.
            mb_idx = jnp.clip(t, 0, n_micro - 1)
            x = jnp.where(stage == 0,
                          jax.lax.dynamic_index_in_dim(
                              xs, mb_idx, keepdims=False),
                          recv)
            y = stage_fn(mine, x)
            # hand my output to the next stage for the next tick
            # (device 0 receives zeros — it reads the feed instead)
            send = jax.lax.ppermute(y, axis, perm)
            # the LAST stage owns microbatch t-(S-1) at tick t
            out_idx = t - (n_stages - 1)
            take = (stage == n_stages - 1) & (out_idx >= 0)
            outs = jnp.where(
                take,
                jax.lax.dynamic_update_index_in_dim(
                    outs, y.astype(outs.dtype),
                    jnp.clip(out_idx, 0, n_micro - 1), 0),
                outs)
            return (send, outs), None

        # the carries become pipe-varying inside the loop (ppermute /
        # masked writes), so their initial values must carry the same
        # varying-manifest type or scan rejects the carry signature
        recv0 = _varying(jnp.zeros_like(xs[0]), axis)
        outs0 = _varying(jnp.zeros_like(xs), axis)
        (_, outs), _ = jax.lax.scan(
            tick, (recv0, outs0), jnp.arange(ticks))
        # only the last stage wrote anything; psum replicates its buffer
        return jax.lax.psum(outs, axis)

    return run(stage_params, xs)


# ----------------------------------------------------------------------
# Token-LM (MusicLSTM) pipelining: stage = one HoistedLSTMLayer
# ----------------------------------------------------------------------

_GATES = ("i", "g", "f", "o")


def stack_lstm_stage_params(variables, n_layers: int):
    """Pack a MusicLSTM param tree's LSTM layers into stage-stacked mats.

    Returns {"w_in": (S, D, 4H), "w_hid": (S, H, 4H), "bias": (S, 4H)}
    where D = max(emb_dim, lstm_hid); layer 0's input rows beyond emb_dim
    are zero (they multiply zero-padded features — exact, see module
    docstring). The concatenation order matches HoistedLSTMLayer
    (models/music_lstm.py), so stage math reproduces it bit-for-bit.
    """
    p = variables["params"]
    w_ins, w_hids, biases = [], [], []
    for i in range(n_layers):
        lp = p[f"lstm_{i}"]
        w_ins.append(jnp.concatenate(
            [lp[f"i{g}"]["kernel"] for g in _GATES], axis=1))
        w_hids.append(jnp.concatenate(
            [lp[f"h{g}"]["kernel"] for g in _GATES], axis=1))
        biases.append(jnp.concatenate(
            [lp[f"h{g}"]["bias"] for g in _GATES], axis=0))
    d = max(w.shape[0] for w in w_ins)
    w_ins = [jnp.pad(w, ((0, d - w.shape[0]), (0, 0))) for w in w_ins]
    return {
        "w_in": jnp.stack(w_ins),
        "w_hid": jnp.stack(w_hids),
        "bias": jnp.stack(biases),
    }


def _lstm_stage(params, x):
    """One HoistedLSTMLayer on a (mb, L, D) microbatch; output re-padded
    to D features so every stage is shape-preserving."""
    h_feat = params["w_hid"].shape[0]
    zx = x @ params["w_in"] + params["bias"]

    def body(carry, z_t):
        c, h = carry
        gates = z_t + h @ params["w_hid"]
        zi, zg, zf, zo = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(zf) * c + jax.nn.sigmoid(zi) * jnp.tanh(zg)
        h = jax.nn.sigmoid(zo) * jnp.tanh(c)
        return (c, h), h

    # derive the zero state from x (not jnp.zeros) so it inherits x's
    # device-varying manifest when run inside pipeline_map's shard_map —
    # the scan carry becomes varying in the body, and its init must match
    z0 = x[:, 0, :h_feat] * 0
    _, ys = jax.lax.scan(body, (z0, z0), zx.swapaxes(0, 1))
    ys = ys.swapaxes(0, 1)  # (mb, L, H)
    pad = x.shape[-1] - h_feat
    if pad:
        ys = jnp.pad(ys, ((0, 0), (0, 0), (0, pad)))
    return ys


def lstm_stack_pipelined(
    variables,
    x_emb: jax.Array,  # (B, L, emb_dim) embedded tokens (+ genre)
    mesh: Mesh,
    n_micro: int,
    n_layers: int,
    axis: str = "pipe",
    dtype=None,
) -> jax.Array:
    """MusicLSTM's recurrent stack, one layer per pipe-axis device.
    Returns the last layer's (B, L, lstm_hid) hidden states — identical
    values to running the layers serially (tests/test_pipeline.py).
    dtype mirrors HoistedLSTMLayer's module dtype: params and inputs are
    cast to it before the gate matmuls (params stay fp32 at rest)."""
    stages = stack_lstm_stage_params(variables, n_layers)
    cdt = dtype or x_emb.dtype
    stages = jax.tree.map(lambda w: w.astype(cdt), stages)
    d = stages["w_in"].shape[1]
    h = stages["w_hid"].shape[1]
    b, l, e = x_emb.shape
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by n_micro {n_micro}")
    x = jnp.pad(x_emb.astype(cdt), ((0, 0), (0, 0), (0, d - e)))
    xs = x.reshape(n_micro, b // n_micro, l, d)
    ys = pipeline_map(_lstm_stage, stages, xs, mesh, axis=axis)
    return ys.reshape(b, l, d)[..., :h]


def music_lstm_pipelined_logits(
    variables,
    tokens: jax.Array,  # (B, L) int
    genres: jax.Array,  # (B,) int
    mesh: Mesh,
    n_micro: int,
    n_layers: int,
    axis: str = "pipe",
    pad_id: int = 0,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    dtype=None,
) -> jax.Array:
    """MusicLSTM forward with the LSTM stack pipelined (embedding and
    vocab head replicated — they are a gather and one matmul; the
    recurrent stack is the pipelined cost). Deterministic by default and
    then matches MusicLSTM.__call__(deterministic=True) exactly;
    differentiable, so jax.grad through it is a pipelined backward.

    Training: MusicLSTM's only dropout sits OUTSIDE the recurrence
    (models/music_lstm.py — after the stack, before the vocab head), so
    passing (dropout_rate, dropout_rng) reproduces the serial model's
    regularization exactly in distribution (inverted dropout, flax
    semantics); the recurrent pipeline itself needs no stochastic state."""
    p = variables["params"]
    # dtype mirrors MusicLSTM's module dtype (nn.Embed/nn.Dense cast
    # params + inputs to it per call; params stay fp32 at rest)
    cdt = dtype or p["tok_emb"]["embedding"].dtype
    tok_e = p["tok_emb"]["embedding"].astype(cdt)[tokens]
    tok_e = jnp.where((tokens == pad_id)[..., None],
                      jnp.zeros((), tok_e.dtype), tok_e)
    x = tok_e + p["genre_emb"]["embedding"].astype(cdt)[genres][:, None, :]
    h = lstm_stack_pipelined(variables, x, mesh, n_micro, n_layers,
                             axis=axis, dtype=dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep_prob = 1.0 - dropout_rate
        keep = jax.random.bernoulli(dropout_rng, keep_prob, h.shape)
        h = jnp.where(keep, h / keep_prob, jnp.zeros((), h.dtype))
    return (h @ p["proj"]["kernel"].astype(cdt)
            + p["proj"]["bias"].astype(cdt))
