"""Length-aware RNN scans over time (TPU: static shapes, `lax.scan`).

Reimplements what the reference delegated to tf.nn.(bidirectional_)dynamic_rnn
(/root/reference/encoder.py:76-89, lm_encoder.py:93-96):
- outputs at t >= seq_len are zeroed (dynamic_rnn zero-pads past the length),
- the backward direction of a bidirectional layer processes each example's
  frames reversed *within its true length* (reverse-with-length, then re-reverse).

The LSTM hot path hoists the input projection x@W_x out of the scan as one
large MXU matmul (see cells.py); only the [B,H]@[H,4H] recurrent matmul stays
sequential.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from e2e_asr_tpu.core import cells

Array = jax.Array


def reverse_sequence(x: Array, lens: Array) -> Array:
    """Reverse x [T, B, ...] along time within each example's length.

    Frames at t >= lens[b] keep their position (they are padding).
    Matches tf.reverse_sequence semantics with seq_axis=0, batch_axis=1.
    """
    T = x.shape[0]
    t = jnp.arange(T)[:, None]                      # [T, 1]
    lens = lens.astype(jnp.int32)[None, :]          # [1, B]
    idx = jnp.where(t < lens, lens - 1 - t, t)      # [T, B]
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=0)


def length_mask(lens: Array, T: int, dtype=jnp.float32) -> Array:
    """[T, B] mask, 1.0 where t < lens[b]."""
    t = jnp.arange(T)[:, None]
    return (t < lens.astype(jnp.int32)[None, :]).astype(dtype)


def use_pallas_lstm() -> bool:
    """Fused Pallas kernel on TPU (and under interpret-mode tests); the XLA
    scan below is the always-correct fallback and test oracle."""
    import os
    if os.environ.get("E2E_ASR_NO_PALLAS"):
        return False
    return True


def lstm_scan(params: dict, x_seq: Array, lens: Array,
              *, compute_dtype=None, impl: str = "auto",
              drop: tuple | None = None) -> Array:
    """Unidirectional LSTM over x_seq [T, B, F] -> outputs [T, B, H].

    Outputs at t >= lens are zeroed. Final state is not returned (the
    reference never consumes RNN final states).

    impl: "auto" (Pallas fused kernel where available), "pallas", or "xla".
    drop: (seed [1] int32, keep) — in-kernel PRNG output dropout on the
    Pallas path (caller gates with lstm_pallas.kernel_dropout_ok_uni; the
    XLA path ignores it — rnn_layer applies xla_dropout there instead).
    """
    T, B, in_dim = x_seq.shape
    hidden = params["bias"].shape[0] // 4
    x_proj = cells.lstm_precompute_inputs(params, x_seq, in_dim,
                                          compute_dtype=compute_dtype,
                                          out_dtype=compute_dtype)

    if impl == "pallas" or (impl == "auto" and use_pallas_lstm()):
        from e2e_asr_tpu.ops import lstm_pallas
        if impl == "pallas" or lstm_pallas.fwd_fits(T, B, hidden,
                                                    compute_dtype is not None):
            outputs = lstm_pallas.lstm_seq(x_proj, params["kernel"][in_dim:],
                                           None if drop is None else drop[0],
                                           compute_dtype is not None,
                                           1.0 if drop is None else drop[1])
            return outputs * length_mask(lens, T)[:, :, None]
        # Layer too wide for the kernel's VMEM budget: XLA scan below.

    w_h = params["kernel"][in_dim:]
    if compute_dtype is not None:
        w_h = w_h.astype(compute_dtype)

    def step(state, xp):
        hh = state.h.astype(w_h.dtype) if compute_dtype is not None else state.h
        gates = xp + jnp.dot(hh, w_h, preferred_element_type=jnp.float32)
        out, new_state = cells._lstm_apply_gates(gates, state.c, hidden)
        return new_state, out

    init = cells.lstm_zero_state((B,), hidden)
    _, outputs = jax.lax.scan(step, init, x_proj)
    return outputs * length_mask(lens, T)[:, :, None]


def gru_scan(params: dict, x_seq: Array, lens: Array,
             *, compute_dtype=None, impl: str = "auto",
             drop: tuple | None = None) -> Array:
    """Unidirectional GRU over x_seq [T, B, F] -> outputs [T, B, H].

    impl: "auto" (Pallas fused kernel where available), "pallas", or "xla".
    drop: (seed [1] int32, keep) — in-kernel PRNG output dropout on the
    Pallas path (caller gates with gru_pallas.kernel_dropout_ok; the XLA
    path ignores it — rnn_layer applies xla_dropout there instead).
    """
    T, B, in_dim = x_seq.shape
    hidden = params["candidate"]["bias"].shape[0]
    # BOTH paths consume the SAME precomputed (and, under bf16 compute,
    # bf16-rounded) input projections — the lstm_scan discipline: never
    # round in only one path (Pallas<->XLA consistency across the
    # fwd_fits boundary and E2E_ASR_NO_PALLAS).
    gates_x, cand_x = cells.gru_precompute_inputs(
        params, x_seq, in_dim, compute_dtype=compute_dtype,
        out_dtype=compute_dtype)
    w_gh = params["gates"]["kernel"][in_dim:]
    w_ch = params["candidate"]["kernel"][in_dim:]

    if impl == "pallas" or (impl == "auto" and use_pallas_lstm()):
        from e2e_asr_tpu.ops import gru_pallas
        if impl == "pallas" or gru_pallas.fwd_fits(T, B, hidden,
                                                   compute_dtype is not None):
            outputs = gru_pallas.gru_seq(
                gates_x, cand_x, w_gh, w_ch,
                None if drop is None else drop[0],
                compute_dtype is not None,
                1.0 if drop is None else drop[1])
            return outputs * length_mask(lens, T)[:, :, None]

    _, outputs = jax.lax.scan(
        functools.partial(_gru_split_step, w_gh, w_ch, hidden, compute_dtype,
                          None),
        cells.gru_zero_state((B,), hidden), (gates_x, cand_x))
    return outputs * length_mask(lens, T)[:, :, None]


def _gru_split_step(w_gh, w_ch, hidden, compute_dtype, freeze, h, xs):
    """One GRU step over precomputed input projections — the exact math of
    the fused kernel (ops/gru_pallas._fwd_kernel): value = sigmoid(gx +
    h@W_gh), c = tanh(cx + (r*h)@W_ch), h' = u*h + (1-u)*c, with the
    matmuls in compute_dtype accumulated f32. freeze: optional (t, lens)
    threading for the stateful/streaming variant."""
    if freeze is None:
        gx, cx = xs
    else:
        gx, cx = xs
        t, h = h
    w_g, w_c = w_gh, w_ch
    hh = h
    if compute_dtype is not None:
        hh = hh.astype(compute_dtype)
        w_g = w_g.astype(compute_dtype)
        w_c = w_c.astype(compute_dtype)
    value = jax.nn.sigmoid(
        gx + jnp.dot(hh, w_g, preferred_element_type=jnp.float32))
    r, u = value[:, :hidden], value[:, hidden:]
    rh = r * h
    rh_c = rh.astype(compute_dtype) if compute_dtype is not None else rh
    c = jnp.tanh(cx + jnp.dot(rh_c, w_c,
                              preferred_element_type=jnp.float32))
    new_h = u * h + (1.0 - u) * c
    if freeze is None:
        return new_h, new_h
    alive = (t < freeze)[:, None]
    return (t + 1, jnp.where(alive, new_h, h)), new_h


def lstm_scan_stateful(params: dict, x_seq: Array, lens: Array, init_state,
                       *, compute_dtype=None):
    """Unidirectional LSTM with an explicit initial state and a
    length-frozen final state — the exact-streaming building block
    (models/encoder.apply_streaming): feeding a sequence in chunks with the
    carried state reproduces one whole-sequence scan exactly.

    Returns (outputs [T,B,H] zeroed past lens, final LSTMState where each
    example's state stops updating at its own length). Always the XLA scan:
    streaming chunks are small and the Pallas kernels pin zero init."""
    T, B, in_dim = x_seq.shape
    hidden = params["bias"].shape[0] // 4
    x_proj = cells.lstm_precompute_inputs(params, x_seq, in_dim,
                                          compute_dtype=compute_dtype,
                                          out_dtype=compute_dtype)
    w_h = params["kernel"][in_dim:]
    if compute_dtype is not None:
        w_h = w_h.astype(compute_dtype)
    lens_i = lens.astype(jnp.int32)

    def step(carry, xp):
        t, state = carry
        hh = (state.h.astype(w_h.dtype) if compute_dtype is not None
              else state.h)
        gates = xp + jnp.dot(hh, w_h, preferred_element_type=jnp.float32)
        out, new_state = cells._lstm_apply_gates(gates, state.c, hidden)
        alive = (t < lens_i)[:, None]
        new_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(alive, n, o), new_state, state)
        return (t + 1, new_state), out

    (_, final), outputs = jax.lax.scan(
        step, (jnp.zeros((), jnp.int32), init_state), x_proj)
    return outputs * length_mask(lens, T)[:, :, None], final


def gru_scan_stateful(params: dict, x_seq: Array, lens: Array, init_state,
                      *, compute_dtype=None):
    """Unidirectional GRU with explicit initial state + length-frozen final
    state (see lstm_scan_stateful). Consumes the same precomputed (and
    bf16-rounded under bf16 compute) input projections and split-matmul
    math as gru_scan/the fused kernel, so streaming chunks reproduce the
    offline encode's numerics."""
    T, B, in_dim = x_seq.shape
    hidden = params["candidate"]["bias"].shape[0]
    gates_x, cand_x = cells.gru_precompute_inputs(
        params, x_seq, in_dim, compute_dtype=compute_dtype,
        out_dtype=compute_dtype)
    lens_i = lens.astype(jnp.int32)

    (_, final), outputs = jax.lax.scan(
        functools.partial(_gru_split_step,
                          params["gates"]["kernel"][in_dim:],
                          params["candidate"]["kernel"][in_dim:],
                          hidden, compute_dtype, lens_i),
        (jnp.zeros((), jnp.int32), init_state), (gates_x, cand_x))
    return outputs * length_mask(lens, T)[:, :, None], final


def rnn_layer_stateful(params: dict, x_seq: Array, lens: Array, state, *,
                       cell: str = "lstm", compute_dtype=None):
    """One FORWARD-only RNN layer with carried state — the streaming form
    of rnn_layer(bidirectional=False). Returns (out [T,B,H], new_state)."""
    scan = lstm_scan_stateful if cell == "lstm" else gru_scan_stateful
    return scan(params["fw"], x_seq, lens, state,
                compute_dtype=compute_dtype)


def rnn_layer(params: dict, x_seq: Array, lens: Array, *, cell: str = "lstm",
              bidirectional: bool = True, compute_dtype=None,
              impl: str = "auto", out_dropout: tuple | None = None) -> Array:
    """One (optionally bidirectional) RNN layer.

    params: {"fw": cell_params[, "bw": cell_params]}.
    x_seq: [T, B, F] time-major. Returns [T, B, H] or [T, B, 2H] (fw;bw concat,
    matching encoder.py:83-84).

    The backward direction must see each example reversed within its own
    length. The XLA path uses reverse_sequence gathers; the Pallas path flips
    the whole array (cheap) and runs the carry-through-masked kernel, which is
    mathematically identical. When both LSTM directions fit VMEM together,
    fw+bw run in ONE fused kernel launch (ops/lstm_pallas.lstm_seq_bidir).

    out_dropout: (key, keep_prob) — this layer OWNS its output dropout. On
    the fused-bidir Pallas path the masks are generated by the core PRNG
    inside the kernel (no HBM mask traffic, replayed exactly in the custom
    VJP); every other path applies layers.dropout(key, out, keep) on the
    concatenated output — byte-identical to the caller having done it.
    """
    import os

    from e2e_asr_tpu.core.layers import dropout as xla_dropout

    scan = lstm_scan if cell == "lstm" else gru_scan
    keep = out_dropout[1] if out_dropout is not None else 1.0
    use_drop = out_dropout is not None and keep < 1.0

    if (bidirectional and cell == "lstm"
            and (impl == "pallas" or (impl == "auto" and use_pallas_lstm()))
            and not os.environ.get("E2E_ASR_NO_BIDIR_FUSED")):
        from e2e_asr_tpu.ops import lstm_pallas
        T, B, in_dim = x_seq.shape
        hidden = params["fw"]["bias"].shape[0] // 4
        kernel_drop = (use_drop
                       and not os.environ.get("E2E_ASR_NO_KERNEL_DROPOUT")
                       and lstm_pallas.kernel_dropout_ok(
                           T, B, hidden, compute_dtype is not None))
        if lstm_pallas.bidir_fits(T, B, hidden, compute_dtype is not None):
            x_proj_fw = cells.lstm_precompute_inputs(
                params["fw"], x_seq, in_dim, compute_dtype=compute_dtype,
                out_dtype=compute_dtype)
            x_flip = jnp.flip(x_seq, axis=0)
            x_proj_bw = cells.lstm_precompute_inputs(
                params["bw"], x_flip, in_dim, compute_dtype=compute_dtype,
                out_dtype=compute_dtype)
            t = jnp.arange(T)[:, None]
            valid = (t >= T - lens.astype(jnp.int32)[None, :]
                     ).astype(jnp.float32)
            if kernel_drop:
                seeds = jax.random.randint(out_dropout[0], (2,), 0,
                                           jnp.iinfo(jnp.int32).max,
                                           dtype=jnp.int32)
            else:
                seeds = None
            h_fw, h_bw_flip = lstm_pallas.lstm_seq_bidir(
                x_proj_fw, x_proj_bw, params["fw"]["kernel"][in_dim:],
                params["bw"]["kernel"][in_dim:], valid[:, :, None],
                seeds, compute_dtype is not None,
                keep if kernel_drop else 1.0)
            fw_out = h_fw * length_mask(lens, T)[:, :, None]
            bw_out = jnp.flip(h_bw_flip * valid[:, :, None], axis=0)
            out = jnp.concatenate([fw_out, bw_out], axis=-1)
            if use_drop and not kernel_drop:
                out = xla_dropout(out_dropout[0], out, keep)
            return out
    if (bidirectional and cell == "gru"
            and (impl == "pallas" or (impl == "auto" and use_pallas_lstm()))):
        # GRU analogue of the LSTM fused-bidir dropout wiring: the two
        # direction kernels take per-direction PRNG seeds (masks generated
        # in-kernel, replayed in the Pallas backward); everything else
        # falls through to the generic path + xla_dropout below.
        from e2e_asr_tpu.core import cells as cells_mod
        from e2e_asr_tpu.ops import gru_pallas
        T, B, in_dim = x_seq.shape
        hidden = params["bw"]["candidate"]["bias"].shape[0]
        kernel_drop = (use_drop
                       and not os.environ.get("E2E_ASR_NO_KERNEL_DROPOUT")
                       and gru_pallas.kernel_dropout_ok(
                           T, B, hidden, compute_dtype is not None))
        if kernel_drop:
            seeds = jax.random.randint(out_dropout[0], (2,), 0,
                                       jnp.iinfo(jnp.int32).max,
                                       dtype=jnp.int32)
            fw_out = gru_scan(params["fw"], x_seq, lens,
                              compute_dtype=compute_dtype, impl=impl,
                              drop=(seeds[0:1], keep))
            x_flip = jnp.flip(x_seq, axis=0)
            t = jnp.arange(T)[:, None]
            valid = (t >= T - lens.astype(jnp.int32)[None, :]
                     ).astype(jnp.float32)
            gates_x, cand_x = cells_mod.gru_precompute_inputs(
                params["bw"], x_flip, in_dim, compute_dtype=compute_dtype,
                out_dtype=compute_dtype)
            h_flip = gru_pallas.gru_seq_masked(
                gates_x, cand_x,
                params["bw"]["gates"]["kernel"][in_dim:],
                params["bw"]["candidate"]["kernel"][in_dim:],
                valid[:, :, None], seeds[1:2],
                compute_dtype is not None, keep)
            bw_out = jnp.flip(h_flip * valid[:, :, None], axis=0)
            return jnp.concatenate([fw_out, bw_out], axis=-1)

    if (not bidirectional and use_drop
            and (impl == "pallas" or (impl == "auto" and use_pallas_lstm()))
            and not os.environ.get("E2E_ASR_NO_KERNEL_DROPOUT")):
        # Forward-only (streaming-trainable) layers: single-direction
        # in-kernel dropout when the kernels admit it.
        T, B, _ = x_seq.shape
        if cell == "lstm":
            from e2e_asr_tpu.ops import lstm_pallas
            hidden = params["fw"]["bias"].shape[0] // 4
            ok = lstm_pallas.kernel_dropout_ok_uni(
                T, B, hidden, compute_dtype is not None)
        else:
            from e2e_asr_tpu.ops import gru_pallas
            hidden = params["fw"]["candidate"]["bias"].shape[0]
            ok = gru_pallas.kernel_dropout_ok(
                T, B, hidden, compute_dtype is not None)
        if ok:
            seed = jax.random.randint(out_dropout[0], (1,), 0,
                                      jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
            return scan(params["fw"], x_seq, lens,
                        compute_dtype=compute_dtype, impl=impl,
                        drop=(seed, keep))

    fw_out = scan(params["fw"], x_seq, lens, compute_dtype=compute_dtype,
                  impl=impl)
    if not bidirectional:
        if use_drop:
            fw_out = xla_dropout(out_dropout[0], fw_out, keep)
        return fw_out

    use_pal = impl == "pallas" or (impl == "auto" and use_pallas_lstm())
    if use_pal and impl == "auto":
        if cell == "lstm":
            from e2e_asr_tpu.ops import lstm_pallas
            hidden = params["bw"]["bias"].shape[0] // 4
            use_pal = lstm_pallas.fwd_fits(x_seq.shape[0], x_seq.shape[1],
                                           hidden, compute_dtype is not None)
        else:
            from e2e_asr_tpu.ops import gru_pallas
            hidden = params["bw"]["candidate"]["bias"].shape[0]
            use_pal = gru_pallas.fwd_fits(x_seq.shape[0], x_seq.shape[1],
                                          hidden, compute_dtype is not None)
    if use_pal:
        from e2e_asr_tpu.core import cells as cells_mod
        T, B, in_dim = x_seq.shape
        x_flip = jnp.flip(x_seq, axis=0)
        # After the flip, example b's padding occupies positions < T - len[b].
        t = jnp.arange(T)[:, None]
        valid = (t >= T - lens.astype(jnp.int32)[None, :]).astype(jnp.float32)
        if cell == "lstm":
            from e2e_asr_tpu.ops import lstm_pallas
            x_proj = cells_mod.lstm_precompute_inputs(
                params["bw"], x_flip, in_dim, compute_dtype=compute_dtype,
                out_dtype=compute_dtype)
            h_flip = lstm_pallas.lstm_seq_masked(
                x_proj, params["bw"]["kernel"][in_dim:], valid[:, :, None],
                None, compute_dtype is not None)
        else:
            from e2e_asr_tpu.ops import gru_pallas
            gates_x, cand_x = cells_mod.gru_precompute_inputs(
                params["bw"], x_flip, in_dim, compute_dtype=compute_dtype,
                out_dtype=compute_dtype)
            h_flip = gru_pallas.gru_seq_masked(
                gates_x, cand_x,
                params["bw"]["gates"]["kernel"][in_dim:],
                params["bw"]["candidate"]["kernel"][in_dim:],
                valid[:, :, None], None, compute_dtype is not None)
        bw_out = jnp.flip(h_flip * valid[:, :, None], axis=0)
    else:
        x_rev = reverse_sequence(x_seq, lens)
        bw_out_rev = scan(params["bw"], x_rev, lens,
                          compute_dtype=compute_dtype, impl="xla")
        bw_out = reverse_sequence(bw_out_rev, lens)
    out = jnp.concatenate([fw_out, bw_out], axis=-1)
    if use_drop:
        out = xla_dropout(out_dropout[0], out, keep)
    return out


def rnn_layer_init(key: Array, in_dim: int, hidden: int, *, cell: str = "lstm",
                   bidirectional: bool = True, init=None, dtype=jnp.float32) -> dict:
    cell_init = cells.lstm_init if cell == "lstm" else cells.gru_init
    kw = {} if init is None else {"init": init}
    if bidirectional:
        k_fw, k_bw = jax.random.split(key)
        return {"fw": cell_init(k_fw, in_dim, hidden, dtype=dtype, **kw),
                "bw": cell_init(k_bw, in_dim, hidden, dtype=dtype, **kw)}
    return {"fw": cell_init(key, in_dim, hidden, dtype=dtype, **kw)}
