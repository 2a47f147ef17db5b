"""CTC prefix scoring for one-pass joint CTC/attention beam decoding.

The standard hybrid decoding recipe (Watanabe/Hori et al., "Joint
CTC/attention decoding"): during the attention beam search, every candidate
extension g·c is additionally scored with the CTC *prefix* probability

    psi(g·c) = log P_ctc(collapsed output begins with g·c | X)

computed incrementally from per-hypothesis forward variables
r^n_t(g) ("g fully emitted, ends in non-blank at frame t") and
r^b_t(g) ("g fully emitted, ends in blank at frame t"), and the beam ranks

    (1 - w) * log p_att + w * (psi(g·c) - psi(g)) + lm_weight * log p_lm .

The <eos> candidate is scored with the COMPLETE-sequence CTC probability
log P_ctc(g | X) = lse(r^n_T(g), r^b_T(g)) instead of a prefix score, so
finishing competes fairly with continuing.

TPU shape discipline: every hypothesis carries r^n/r^b as dense [T] vectors
([B, k, T] overall); one `lax.scan` over frames evaluates ALL candidate
extensions of all hypotheses at once ([B, k, P] per frame, P = the
pre-pruned candidate count). For small vocabularies P = V (exact); for
large (BPE) vocabularies the per-step candidate list is pre-pruned to the
attention decoder's top-P tokens (ESPnet's pre-beam), everything else
scoring NEG_INF — selection semantics are unchanged whenever the winning
tokens are in the list, which the pre-beam guarantees in practice and the
P >= k floor guarantees for liveness.

No reference counterpart (/root/reference is attention-only at decode time);
the weighting convention matches eval/rescore.py's offline n-best rescoring
so `-ctc_rescore w` and `-joint_ctc w` are directly comparable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from e2e_asr_tpu.data.text import EOS_ID

Array = jax.Array
NEG_INF = -1e30


def _lse(a: Array, b: Array) -> Array:
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG_INF)
    return m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))


class CTCPrefixScorer:
    """Batched incremental CTC prefix scorer over [B, T, V] frame logits.

    Construct once per utterance batch (inside jit is fine — it only holds
    arrays); thread its dict states through the beam loop:

        state = scorer.init_state(k)
        delta, cand = scorer.step(state, att_logp)   # [B,k,V] score deltas
        state = scorer.select(cand, parent, token)
    """

    def __init__(self, ctc_logits: Array, enc_lens: Array, *,
                 blank_id: int = 0, eos_id: int = EOS_ID,
                 pre_beam: int | None = None):
        B, T, V = ctc_logits.shape
        lp = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), axis=-1)
        valid = (jnp.arange(T)[None, :]
                 < enc_lens.astype(jnp.int32)[:, None])        # [B, T]
        # Frames past each utterance's length contribute nothing anywhere.
        self.lp = jnp.where(valid[:, :, None], lp, NEG_INF)
        self.lp_blank = self.lp[:, :, blank_id]                # [B, T]
        self.last_t = jnp.maximum(enc_lens.astype(jnp.int32) - 1, 0)
        self.blank_id = blank_id
        self.eos_id = eos_id
        self.pre_beam = pre_beam
        self.B, self.T, self.V = B, T, V

    def init_state(self, k: int) -> dict:
        B, T = self.B, self.T
        # Empty prefix: can only have emitted blanks so far.
        rb_empty = jnp.cumsum(self.lp_blank, axis=1)           # [B, T]
        return {
            "rn": jnp.full((B, k, T), NEG_INF, jnp.float32),
            "rb": jnp.broadcast_to(rb_empty[:, None, :], (B, k, T)),
            "psi": jnp.zeros((B, k), jnp.float32),
            "last": jnp.full((B, k), -1, jnp.int32),
        }

    def step(self, state: dict, att_logp: Array) -> tuple[Array, dict]:
        """Score all candidate extensions of every live hypothesis.

        Args:
            state: per-hypothesis scorer state ([B, k, ...] leaves).
            att_logp: [B, k, V] attention log-probs — used only to pick the
                pre-beam candidate list when V > pre_beam.
        Returns:
            (delta [B, k, V]: psi(g·c) - psi(g) per candidate, NEG_INF for
             non-candidates/blank, the complete-sequence delta at eos;
             cand_state for `select`).
        """
        B, T, V = self.B, self.T, self.V
        k = att_logp.shape[1]
        P = V if self.pre_beam is None else min(V, max(self.pre_beam, k))
        if P < V:
            _, cand = jax.lax.top_k(att_logp, P)               # [B, k, P]
        else:
            cand = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32),
                                    (B, k, V))
        allowed = cand != state["last"][:, :, None]            # repeat needs blank
        phi0 = jnp.where(state["last"] < 0, 0.0, NEG_INF)[:, :, None]
        phi0 = jnp.broadcast_to(phi0, (B, k, P))

        from e2e_asr_tpu.core.rnn import use_pallas_lstm
        from e2e_asr_tpu.ops import ctc_prefix_pallas
        if use_pallas_lstm() and ctc_prefix_pallas.supported(B * k, P):
            # Fused path: one launch runs the whole frame scan
            # (ops/ctc_prefix_pallas.py). The candidate gather happens here
            # as ONE XLA gather over all frames (batch-dim broadcast — no
            # [B,k,T,V] materialization).
            xc_all = jnp.take_along_axis(
                jnp.swapaxes(self.lp, 1, 2)[:, None],          # [B, 1, V, T]
                cand[:, :, :, None], axis=2)                   # [B, k, P, T]
            xc_tm = jnp.moveaxis(xc_all, 3, 0).reshape(T, B * k, P)
            xb_tm = jnp.broadcast_to(
                jnp.swapaxes(self.lp_blank, 0, 1)[:, :, None],
                (T, B, k)).reshape(T, B * k, 1)
            rn_par = jnp.moveaxis(state["rn"], 2, 0).reshape(T, B * k, 1)
            rb_par = jnp.moveaxis(state["rb"], 2, 0).reshape(T, B * k, 1)
            allow_neg = jnp.where(allowed, 0.0, NEG_INF).reshape(B * k, P)
            psi_f, rn_tm, rb_tm = ctc_prefix_pallas.prefix_scan(
                xc_tm, xb_tm, rn_par, rb_par, allow_neg,
                phi0.reshape(B * k, P))
            psi_f = psi_f.reshape(B, k, P)
            rn_seq = rn_tm.reshape(T, B, k, P)
            rb_seq = rb_tm.reshape(T, B, k, P)
        else:
            # Time-major inputs for the frame scan.
            x_tm = jnp.swapaxes(self.lp, 0, 1)                 # [T, B, V]
            xb_tm = jnp.swapaxes(self.lp_blank, 0, 1)          # [T, B]
            rn_par = jnp.moveaxis(state["rn"], 2, 0)           # [T, B, k]
            rb_par = jnp.moveaxis(state["rb"], 2, 0)

            def frame(carry, xs):
                rn_p, rb_p, psi_p, phi_p = carry               # [B, k, P]
                x_t, xb_t, rn_pt, rb_pt = xs
                xc = jnp.take_along_axis(
                    jnp.broadcast_to(x_t[:, None, :], (B, k, V)), cand,
                    axis=-1)
                rn_t = _lse(rn_p, phi_p) + xc
                rb_t = _lse(rb_p, rn_p) + xb_t[:, None, None]
                psi_t = _lse(psi_p, phi_p + xc)
                phi_t = _lse(rb_pt[:, :, None],
                             jnp.where(allowed, rn_pt[:, :, None], NEG_INF))
                return (rn_t, rb_t, psi_t, phi_t), (rn_t, rb_t)

            init = (jnp.full((B, k, P), NEG_INF),
                    jnp.full((B, k, P), NEG_INF),
                    jnp.full((B, k, P), NEG_INF), phi0)
            (_, _, psi_f, _), (rn_seq, rb_seq) = jax.lax.scan(
                frame, init, (x_tm, xb_tm, rn_par, rb_par))

        psi_prev = state["psi"]
        bad = jnp.minimum(psi_f, psi_prev[:, :, None]) < NEG_INF / 2
        delta_c = jnp.where(bad, NEG_INF, psi_f - psi_prev[:, :, None])

        if P < V:
            b_idx = jnp.arange(B)[:, None, None]
            k_idx = jnp.arange(k)[None, :, None]
            delta = jnp.full((B, k, V), NEG_INF)
            delta = delta.at[b_idx, k_idx, cand].set(delta_c)
        else:
            delta = delta_c

        # <eos>: the hypothesis ends — score the COMPLETE CTC probability.
        t_idx = self.last_t[:, None, None]                     # [B, 1, 1]
        rn_T = jnp.take_along_axis(state["rn"], jnp.broadcast_to(
            t_idx, (B, k, 1)), axis=2)[:, :, 0]
        rb_T = jnp.take_along_axis(state["rb"], jnp.broadcast_to(
            t_idx, (B, k, 1)), axis=2)[:, :, 0]
        total = _lse(rn_T, rb_T)
        bad_eos = jnp.minimum(total, psi_prev) < NEG_INF / 2
        delta = delta.at[:, :, self.eos_id].set(
            jnp.where(bad_eos, NEG_INF, total - psi_prev))
        # Blank is a CTC transition, not a label — never a valid extension.
        delta = delta.at[:, :, self.blank_id].set(NEG_INF)

        cand_state = {"rn": jnp.moveaxis(rn_seq, 0, 3),        # [B, k, P, T]
                      "rb": jnp.moveaxis(rb_seq, 0, 3),
                      "psi": psi_f, "cand": cand}
        return delta, cand_state

    def select(self, cand_state: dict, parent: Array,
               token: Array) -> dict:
        """Advance to the selected (parent, token) per new beam slot.

        Slots whose token was not in the parent's candidate list (dead or
        finished slots — live non-candidates score NEG_INF and P >= k keeps
        enough finite candidates) receive unspecified values; the beam never
        reads them."""
        def by_parent(a):
            idx = parent.reshape(parent.shape + (1,) * (a.ndim - 2))
            return jnp.take_along_axis(a, idx, axis=1)

        cand_par = by_parent(cand_state["cand"])               # [B, k, P]
        pos = jnp.argmax(cand_par == token[:, :, None], axis=-1)
        def by_pos(a):                                         # [B,k,P,...] -> [B,k,...]
            idx = pos.reshape(pos.shape + (1,) * (a.ndim - 2))
            return jnp.take_along_axis(a, idx, axis=2)[:, :, 0]

        return {"rn": by_pos(by_parent(cand_state["rn"])),
                "rb": by_pos(by_parent(cand_state["rb"])),
                "psi": jnp.maximum(by_pos(by_parent(cand_state["psi"])),
                                   NEG_INF),
                "last": token.astype(jnp.int32)}
