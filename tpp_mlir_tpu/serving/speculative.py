"""Speculative decoding: draft-model proposal + single-pass target
verification (greedy — provably EXACT vs the target's own greedy output).

Decode is HBM-bandwidth-bound: every single-token step re-reads all
target weights (PERF.md "serving"). Speculative decoding turns that
around: a small DRAFT model proposes K tokens with K cheap steps, then
the TARGET scores all K+1 positions in ONE `make_extend` pass — one
target-weight read per ~(accepted+1) tokens instead of per token. With
greedy acceptance (accept while target argmax == draft token, then take
the target's own argmax at the first mismatch) the emitted stream is
IDENTICAL to target-only greedy decoding, so the technique is pure
latency win — acceptance rate only changes the speed, never the output.

TPU-native shape discipline:
- The macro step is ONE jitted program: a `lax.scan` of K draft steps,
  one target extend of static width K+1, and the accept/emit logic in
  vectorized lax ops (cumprod-of-matches acceptance count) — no
  data-dependent shapes anywhere.
- The generate loop is a `lax.while_loop` carrying both KV caches, an
  output buffer written with dynamic_update_slice at a token cursor
  (over-written speculative tails are overwritten by the next macro
  step), and acceptance counters.
- Rejected speculative cache entries are NOT rolled back: positions
  beyond `pos` are dead by the position mask and the next macro step
  overwrites them — the same static-shape argument as the decode cache.

Batch is restricted to B=1: acceptance length is data-dependent PER
SEQUENCE, and the engine's cache keeps one scalar `pos` (the right
trade for the latency regime speculative decoding targets).

The reference framework has no serving loop at all (SURVEY.md §2); this
composes the extend primitive with the measured decode path.
"""

from __future__ import annotations

from .engine import GptConfig, make_decode_step, make_extend, make_prefill


def make_speculative_generate(cfg: GptConfig, draft_cfg: GptConfig | None,
                              steps: int, k: int = 4,
                              use_pallas: bool | None = None,
                              draft_vocab: int = 0,
                              trunk_layers: int = 0):
    """Return jitted `generate(params, draft_params, ids) ->
    (tokens (1, steps), stats)` emitting exactly the target's greedy
    continuation. `stats` = {"macro_steps", "drafted", "accepted"}
    (device scalars; acceptance rate = accepted / drafted).

    Requires ids.shape[1] + steps + k + 1 <= cfg.max_seq (the verify
    pass writes k+1 speculative cache rows past the frontier; the
    static-shape cache must hold them).

    `draft_vocab` (0 = off) truncates the DRAFT's lm_head to its first
    `draft_vocab` columns: the r5 bisect (spec_bisect_r5.json) showed
    the K+1 draft steps dominated by the full-vocab head (embed x 50k
    ~ 77 MB/step vs a ~28 MB 2-layer body), so a frequency-ordered
    vocab prefix cuts draft bytes ~3x. Greedy-EXACTNESS is preserved:
    proposals are limited to [0, draft_vocab) token ids, and whenever
    the target's greedy token lies outside that prefix the draft simply
    mismatches and the verify pass emits the target's own token — only
    the acceptance rate (speed) changes, never the output stream.

    `trunk_layers` N > 0 makes the draft SELF-SPECULATIVE (tied-trunk /
    early-exit): the draft is the TARGET's first N blocks + the target's
    final norm and lm_head, so (a) it costs ZERO extra parameters,
    (b) there is no separate draft prefill — its trunk KV cache starts
    as a slice of the target's layers [0, N), and (c) on real imported
    weights the proposals are the target's own early-exit predictions
    (genuinely correlated, unlike an unrelated small draft). Exactness
    is untouched: draft numerics only ever change the acceptance RATE
    (the r5 lesson that headroom needs a cheaper draft BODY — this is
    the cheapest body that still tracks the target). Pass
    draft_cfg=None; the returned generate takes (params, ids)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    if trunk_layers:
        assert draft_cfg is None, \
            "trunk_layers derives the draft from the target; do not " \
            "pass a separate draft_cfg"
        assert 0 < trunk_layers <= cfg.layers, (trunk_layers, cfg.layers)
        draft_cfg = dataclasses.replace(cfg, layers=trunk_layers)
    assert cfg.vocab == draft_cfg.vocab, "draft must share the vocab"
    assert cfg.max_seq == draft_cfg.max_seq, \
        "draft cache must cover the same positions"
    assert 0 <= draft_vocab <= cfg.vocab, \
        f"draft_vocab {draft_vocab} exceeds vocab {cfg.vocab}"

    prefill_t = make_prefill(cfg, use_pallas)
    prefill_d = None if trunk_layers else make_prefill(draft_cfg,
                                                       use_pallas)
    draft_step = make_decode_step(draft_cfg)
    verify = make_extend(cfg)

    def macro(params, draft_params, tcache, dcache, tok):
        """One speculative round. tok: (1,) the current frontier token
        (sits at position pos, not yet scored). Returns updated caches,
        emit (k+1,) tokens of which `count` are valid, and count."""
        pos = tcache["pos"]

        def dstep(carry, _):
            dcache, t = carry
            logits, dcache = draft_step(draft_params, dcache, t)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (dcache, nxt), nxt[0]

        # k+1 steps, not k: the last proposal drafts[k-1] must itself be
        # FED THROUGH a draft step so its KV row (position pos+k) is
        # written — on a fully-accepted round newpos = pos+k+1 and the
        # next round's draft attends over position pos+k; with only k
        # steps that row held garbage forever and acceptance silently
        # degraded (measured: self-draft at 35/52 instead of 52/52).
        # The k+1'th proposal is unused; the extra step is one cheap
        # draft forward per round.
        (dcache, _), drafts = jax.lax.scan(
            dstep, (dcache, tok), None, length=k + 1)
        drafts = drafts[:k]                                # (k,)

        u = jnp.concatenate([tok, drafts])[None]           # (1, k+1)
        logits, tcache = verify(params, tcache, u)         # (1, k+1, V)
        t = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # (k+1,)

        # accept the longest prefix where the draft equals the target's
        # own greedy choice; cumprod turns the match mask into a prefix
        n = jnp.sum(jnp.cumprod((drafts == t[:k]).astype(jnp.int32)))
        # emit drafts[:n] then the target's token at the first mismatch
        # (or the bonus token when all k were accepted)
        emit = jnp.where(jnp.arange(k + 1) < n,
                         jnp.concatenate([drafts, drafts[-1:]]), t)
        count = n + 1
        newpos = pos + count
        tcache = dict(tcache)
        dcache = dict(dcache)
        tcache["pos"] = newpos
        dcache["pos"] = newpos
        return tcache, dcache, emit, count

    def generate(params, draft_params, ids):
        B, s0 = ids.shape
        assert B == 1, "speculative decoding serves the B=1 latency path"
        assert s0 + steps + k + 1 <= cfg.max_seq, \
            f"prompt {s0} + steps {steps} + k+1 {k + 1} exceeds " \
            f"max_seq {cfg.max_seq}"
        if trunk_layers:
            blocks = params["blocks"]
            assert isinstance(blocks, dict), \
                "trunk_layers needs the stack_params (L, ...) layout"
            # the draft IS the target's first N blocks + its final norm
            # and head; the slice is loop-invariant (hoisted once)
            draft_params = dict(params)
            draft_params["blocks"] = jax.tree_util.tree_map(
                lambda a: a[:trunk_layers], blocks)
        if draft_vocab:
            lm = draft_params["lm_head"]
            if not hasattr(lm, "shape"):
                raise NotImplementedError(
                    "draft_vocab requires an unquantized draft lm_head")
            # one loop-invariant slice, hoisted out of the while_loop:
            # every draft step then reads E x draft_vocab head bytes
            draft_params = dict(draft_params)
            draft_params["lm_head"] = lm[:, :draft_vocab]
        logits, tcache = prefill_t(params, ids)
        if trunk_layers:
            # no draft prefill: the trunk's prompt cache IS the target's
            # first N layers (identical weights on identical inputs);
            # draft-written rows past the prompt only affect acceptance
            dcache = {kk: (v if kk == "pos" else v[:trunk_layers])
                      for kk, v in tcache.items()}
        else:
            _, dcache = prefill_d(draft_params, ids)
        tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

        buf = jnp.zeros((steps + k + 1,), jnp.int32)
        buf = buf.at[0].set(tok0[0])

        def cond(carry):
            _, _, _, _, cursor, _, _ = carry
            return cursor < steps

        def body(carry):
            tcache, dcache, tok, buf, cursor, macros, accepted = carry
            tcache, dcache, emit, count = macro(
                params, draft_params, tcache, dcache, tok)
            buf = jax.lax.dynamic_update_slice(buf, emit, (cursor,))
            tok = emit[count - 1][None]
            return (tcache, dcache, tok, buf, cursor + count,
                    macros + 1, accepted + count - 1)

        carry = (tcache, dcache, tok0, buf,
                 jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32),
                 jnp.asarray(0, jnp.int32))
        _, _, _, buf, _, macros, accepted = jax.lax.while_loop(
            cond, body, carry)
        stats = {"macro_steps": macros, "drafted": macros * k,
                 "accepted": accepted}
        return buf[None, :steps], stats

    if trunk_layers:
        return jax.jit(lambda params, ids: generate(params, None, ids))
    return jax.jit(generate)
