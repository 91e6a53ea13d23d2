"""Continuous batching for the serving engine: slot-based, static shapes.

The TPU-native answer to vLLM-style continuous batching (the design
JetStream uses on real TPU serving stacks): the decode batch is a fixed
array of B SLOTS, each slot owning one row of the stacked KV cache and
its own sequence position. Requests are admitted into free slots as they
arrive (prefill at batch 1, then one `dynamic_update_slice` inserts the
prefilled KV rows into the slot), every decode step advances ALL slots
together, and a finished slot is simply re-filled by the next request —
no request ever waits for the whole batch to drain (the static-batch
failure mode this exists to fix).

Everything the compiler sees is static-shape:

- prompts are right-padded to a small set of BUCKET lengths (one prefill
  compile per bucket; causal masking makes the padded rows' K/V exact for
  the real rows, and the first sampled token reads the true last row);
- the decode step is the measured-fastest T=1 path (`_decode_body`) with
  per-slot positions: `cache["pos"]` is (B,) and the KV write is one
  batched scatter (`.at[li, arange(B), pos].set(..., mode="drop")`) —
  a free slot parks at the sentinel `pos == max_seq`, whose writes drop;
- the host syncs once per `sync_steps` decode iterations (a `lax.scan`
  emits the sampled tokens); between syncs the active set is frozen —
  admission latency is bounded by sync_steps tokens, the standard
  continuous-batching granularity trade. Finished-slot rows inside a
  sync window decode garbage that the host discards.

Composes with GQA (`kv_heads`), weight-only int8 (QTensor params) and
the int8 KV cache — all through the same `_decode_body` trace.

The reference framework (a kernel compiler) has no serving runtime at
all; this subsystem is beyond-parity, designed against the public
JetStream/vLLM scheduling model rather than any reference code.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from .engine import (GptConfig, _np_dtype, make_decode_step, make_prefill,
                     make_sampler, stack_params)

DEFAULT_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)


def init_slot_cache(cfg: GptConfig, slots: int):
    """Empty slotted decode cache: zero KV, every slot parked at the
    free sentinel ``pos == max_seq`` (scatter-dropped, never attended)."""
    import jax.numpy as jnp

    L, S = cfg.layers, cfg.max_seq
    kvh, D = cfg.kv_h, cfg.head_dim
    if cfg.kv_packed:
        # head-pair-packed cache layout (engine.GptConfig.kv_packed);
        # caught by the serving config fuzzer on its first run
        kvh, D = kvh // 2, 2 * D
    if cfg.kv_quant == "int8":
        cache = {"k": jnp.zeros((L, slots, kvh, S, D), jnp.int8),
                 "v": jnp.zeros((L, slots, kvh, S, D), jnp.int8),
                 "k_s": jnp.zeros((L, slots, kvh, S), jnp.float32),
                 "v_s": jnp.zeros((L, slots, kvh, S), jnp.float32)}
    else:
        dt = _np_dtype(cfg.dtype)
        cache = {"k": jnp.zeros((L, slots, kvh, S, D), dt),
                 "v": jnp.zeros((L, slots, kvh, S, D), dt)}
    cache["pos"] = jnp.full((slots,), S, jnp.int32)
    return cache


def make_insert(cfg: GptConfig):
    """Return jitted ``insert(cache, pcache, slot, true_len) -> cache``:
    copy a batch-1 prefill cache into slot ``slot`` of a slotted decode
    cache and set that slot's position to ``true_len`` (the un-padded
    prompt length — the prefill ran at the padded bucket length, but
    rows past true_len are masked off by the position, so the bucket
    padding never leaks into attention)."""
    import jax
    import jax.numpy as jnp

    def insert(cache, pcache, slot, true_len):
        out = dict(cache)
        for key in cache:
            if key == "pos":
                continue
            src = pcache[key].astype(cache[key].dtype)
            start = (0, slot) + (0,) * (cache[key].ndim - 2)
            out[key] = jax.lax.dynamic_update_slice(cache[key], src, start)
        out["pos"] = cache["pos"].at[slot].set(
            jnp.asarray(true_len, jnp.int32))
        return out

    return jax.jit(insert, donate_argnums=(0,))


def make_decode_loop(cfg: GptConfig, sync_steps: int,
                     temperature: float = 0.0, top_k: int = 0,
                     top_p: float = 0.0, mesh=None, tp_axis: str = "tp",
                     quantized: bool = False):
    """Return jitted ``loop(params, cache, tok, rng) ->
    (toks (sync_steps, B), cache, tok, rng)``: ``sync_steps`` decode
    iterations under one `lax.scan`, sampling on device, emitting only
    the (sync_steps, B) int32 token ids to the host — the per-sync
    transfer is bytes, not logits. With ``mesh`` the step is the
    Megatron tensor-parallel decode (heads + KV cache sharded over
    ``tp_axis``; shard_map reshards the inputs to the decode specs)."""
    import jax
    import jax.numpy as jnp

    if mesh is None:
        step = make_decode_step(cfg)
    else:
        from .engine import make_tp_decode_step

        step = make_tp_decode_step(mesh, cfg, tp_axis,
                                   quantized=quantized)
    sample = make_sampler(temperature, top_k, top_p)

    def loop(params, cache, tok, rng):
        def body(carry, _):
            cache, tok, rng = carry
            logits, cache = step(params, cache, tok)
            rng, sub = jax.random.split(rng)
            nxt = sample(logits, sub)
            return (cache, nxt, rng), nxt

        (cache, tok, rng), toks = jax.lax.scan(
            body, (cache, tok, rng), None, length=sync_steps)
        return toks, cache, tok, rng

    # the cache is rebound every sync: donate it so the scan carry
    # aliases the same HBM buffers round after round
    return jax.jit(loop, donate_argnums=(1,))


@dataclass
class Request:
    rid: int
    prompt: object                      # np.ndarray (S0,) int32
    max_new: int
    tokens: list = field(default_factory=list)
    done: bool = False


class BatchingEngine:
    """Host-side continuous-batching scheduler over the slotted decode
    step. Greedy by default; set temperature/top_k/top_p for sampling.

    ``submit()`` enqueues prompts; ``step()`` runs one scheduling round
    (admit into free slots, then ``sync_steps`` device decode steps);
    ``run()`` drives rounds until every submitted request finished and
    returns {rid: token list}. Generation stops at ``eos_id`` (if set),
    ``max_new`` tokens, or a full cache (max_seq), whichever is first.
    """

    def __init__(self, params, cfg: GptConfig, slots: int = 4,
                 sync_steps: int = 4, eos_id: int | None = None,
                 buckets=DEFAULT_BUCKETS, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 0.0, seed: int = 0,
                 tp_mesh=None, tp_axis: str = "tp",
                 use_pallas: bool | None = None):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from .quant import QTensor

        self._np, self._jnp = np, jnp
        self.cfg, self.slots, self.sync_steps = cfg, slots, sync_steps
        self.eos_id = eos_id
        self.buckets = tuple(b for b in sorted(buckets) if b <= cfg.max_seq)
        if not self.buckets:
            raise ValueError("no bucket fits max_seq")
        # hybrid layout (PERF.md serving): stacked params for prefill
        # (one scan'd block body through the remote-compile channel),
        # unstacked for decode (static layer indices fuse cache slices)
        self.params = params
        self._sparams = (params if isinstance(params.get("blocks"), dict)
                         else stack_params(params))
        self._prefill = make_prefill(cfg, use_pallas)
        self._insert = make_insert(cfg)
        quantized = any(isinstance(leaf, QTensor) for leaf in
                        jax.tree.leaves(
                            params, is_leaf=lambda x: isinstance(
                                x, QTensor)))
        self._loop = make_decode_loop(cfg, sync_steps, temperature,
                                      top_k, top_p, mesh=tp_mesh,
                                      tp_axis=tp_axis,
                                      quantized=quantized)
        self._sample = jax.jit(make_sampler(temperature, top_k, top_p))
        self.cache = init_slot_cache(cfg, slots)
        self.tok = jnp.zeros((slots,), jnp.int32)
        self._seed = seed
        self._rng = jax.random.PRNGKey(seed)
        self.slot_req: list[Request | None] = [None] * slots
        self.queue: deque[Request] = deque()
        self.finished: dict[int, list[int]] = {}
        self._next_rid = 0

    # -- client API -------------------------------------------------------
    def reset(self) -> None:
        """Clear all scheduling state (cache, slots, queue, results) but
        keep every compiled program — e.g. to replay a trace warm."""
        import jax

        self.cache = init_slot_cache(self.cfg, self.slots)
        self.tok = self._jnp.zeros((self.slots,), self._jnp.int32)
        self._rng = jax.random.PRNGKey(self._seed)
        self.slot_req = [None] * self.slots
        self.queue.clear()
        self.finished = {}
        self._next_rid = 0

    def submit(self, ids, max_new: int = 32) -> int:
        """Enqueue a prompt (1-D int sequence). Returns the request id."""
        ids = self._np.asarray(ids, self._np.int32).reshape(-1)
        if ids.size == 0 or ids.size > self.buckets[-1]:
            raise ValueError(f"prompt length {ids.size} outside "
                             f"(0, {self.buckets[-1]}]")
        rid = self._next_rid
        self._next_rid += 1
        self.queue.append(Request(rid, ids, max_new))
        return rid

    def run(self) -> dict[int, list[int]]:
        """Drive rounds until all submitted requests finish."""
        while self.queue or any(r is not None for r in self.slot_req):
            self.step()
        return self.finished

    # -- one scheduling round ----------------------------------------------
    def step(self) -> None:
        self._admit()
        if all(r is None for r in self.slot_req):
            return
        toks, self.cache, self.tok, self._rng = self._loop(
            self.params, self.cache, self.tok, self._rng)
        toks = self._np.asarray(toks)               # (sync_steps, B)
        for b, req in enumerate(self.slot_req):
            if req is None:
                continue
            for t in toks[:, b]:
                req.tokens.append(int(t))
                if self._exhausted(req):
                    break
            if req.done:
                self._retire(b, req)

    # -- internals ---------------------------------------------------------
    def _exhausted(self, req: Request) -> bool:
        t = req.tokens[-1]
        cap = self.cfg.max_seq - len(req.prompt)
        if (self.eos_id is not None and t == self.eos_id) \
                or len(req.tokens) >= min(req.max_new, cap):
            req.done = True
        return req.done

    def _retire(self, slot: int, req: Request) -> None:
        self.finished[req.rid] = req.tokens[:]
        self.slot_req[slot] = None
        # park the slot: sentinel position drops its KV writes
        self.cache["pos"] = self.cache["pos"].at[slot].set(
            self.cfg.max_seq)

    def _admit(self) -> None:
        jnp = self._jnp
        for slot in range(self.slots):
            if not self.queue or self.slot_req[slot] is not None:
                continue
            req = self.queue.popleft()
            n = len(req.prompt)
            bucket = next(b for b in self.buckets if b >= n)
            ids = self._np.zeros((1, bucket), self._np.int32)
            ids[0, :n] = req.prompt
            logits, pcache = self._prefill(self._sparams, jnp.asarray(ids))
            import jax
            self._rng, sub = jax.random.split(self._rng)
            first = self._sample(logits[:, n - 1], sub)   # (1,)
            self.cache = self._insert(self.cache, pcache, slot, n)
            self.tok = self.tok.at[slot].set(first[0])
            req.tokens.append(int(first[0]))
            self.slot_req[slot] = req
            if self._exhausted(req):
                self._retire(slot, req)


# ---------------------------------------------------------------------------
# Device-side admission: retire + admit + decode inside ONE jitted scan.
#
# The host scheduler above pays ~3 host round trips per admission (prefill,
# insert, first-token sample) plus one per sync window, and its admission
# latency is bounded by sync_steps — so under a high-RTT link (the axon
# tunnel's ~25 ms) sync_steps trades throughput against slot idle time and
# continuous batching measured 0.41x STATIC batching (batching_r5.json).
# This engine moves the whole scheduling loop into the compiled program:
#
# - prefill runs up-front in BATCHED bucket groups and lands per-request KV
#   in a STAGING buffer (the JetStream prefill-engine/insert model: one
#   padded-to-max_seq KV slab per request, first token pre-sampled);
# - the decode macro-step is a `lax.scan` whose every iteration retires
#   exhausted slots, admits (at most) one staged request into the first
#   free slot under `lax.cond` (a ~L*kvh*S*D DUS copy from staging into the
#   slot row — executed only when taken), decodes ALL slots one token, and
#   scatters live tokens into a per-request output buffer;
# - the host only re-invokes the macro and refills the staging wave, so the
#   RTT cost amortizes over sync_steps tokens while admission latency stays
#   ONE decode step regardless of sync_steps — the granularity trade the
#   host scheduler is stuck with simply disappears.
#
# Memory: staging holds `wave + prefill_rows` padded KV slabs
# (wave * L * kv_h * max_seq * D * bytes * 2), the knob that bounds it; the
# host refills consumed waves between macro calls. Everything is static
# shape; one compile per (slots, sync_steps, wave, R, max_new) tuple.
#
# The reference framework has no serving runtime (this subsystem is
# beyond-parity); the design argues with the public JetStream/vLLM
# scheduling model, not reference code.
# ---------------------------------------------------------------------------


def init_staging(cfg: GptConfig, rows: int):
    """Staging buffer: `rows` per-request KV slabs, same key layout as the
    slotted cache minus "pos" (axis 1 = staging row instead of slot)."""
    cache = init_slot_cache(cfg, rows)
    del cache["pos"]
    return cache


def make_stage_prefill(cfg: GptConfig, temperature: float = 0.0,
                       top_k: int = 0, top_p: float = 0.0,
                       use_pallas: bool | None = None):
    """Return jitted ``stage(sparams, ids, lens, staging, offset, rng) ->
    (staging, firsts)``: batched prefill of one bucket group, write the
    per-request KV slabs into staging rows [offset, offset+rows) and
    pre-sample each request's first token from its true-last-row logits.
    One compile per (bucket, rows) shape; rows of padded groups write
    garbage slabs that the wave layout overwrites or never admits."""
    import jax
    import jax.numpy as jnp

    prefill = make_prefill(cfg, use_pallas)
    sample = make_sampler(temperature, top_k, top_p)

    def stage(sparams, ids, lens, staging, offset, rng):
        logits, pcache = prefill(sparams, ids)
        rows = logits[jnp.arange(ids.shape[0]), lens - 1]    # (G, V)
        firsts = sample(rows, rng)
        new = dict(staging)
        for key in staging:
            src = pcache[key].astype(staging[key].dtype)
            new[key] = jax.lax.dynamic_update_slice(
                staging[key], src,
                (0, offset) + (0,) * (staging[key].ndim - 2))
        return new, firsts

    return jax.jit(stage, donate_argnums=(3,))


def make_device_loop(cfg: GptConfig, sync_steps: int,
                     temperature: float = 0.0, top_k: int = 0,
                     top_p: float = 0.0, eos_id: int | None = None):
    """Return the jitted device-scheduler macro step:

    ``macro(params, cache, tok, rng, rid, left, out, olen, nxt_l,
    staging, wlen, wnew, wfirst, wrid, wcount) ->
    (cache, tok, rng, rid, left, out, olen, nxt_l, live_n)``

    Up to ``sync_steps`` while-loop iterations (EARLY EXIT once no slot
    is live and the staged wave is drained, so a large sync_steps costs
    zero overshoot at trace end), each: retire slots whose budget hit 0
    (rid -> the trash sentinel R, pos -> max_seq so KV writes drop), admit
    at most one staged request into the first free slot (lax.cond: copy
    the staged slab, set pos/tok/budget, record the pre-sampled first
    token), decode every slot one step, scatter live tokens into
    ``out[rid, olen[rid]]``. Free slots decode garbage into the trash row
    R = out.shape[0]-1. Host state crossing the boundary per call: three
    scalars (nxt_l in, nxt_l/live_n out)."""
    import jax
    import jax.numpy as jnp

    step = make_decode_step(cfg)
    sample = make_sampler(temperature, top_k, top_p)
    S = cfg.max_seq

    def macro(params, cache, tok, rng, rid, left, out, olen, nxt_l,
              staging, wlen, wnew, wfirst, wrid, wcount):
        R = out.shape[0] - 1            # trash row / free-slot sentinel
        MAXNEW = out.shape[1]
        nxt_l = jnp.asarray(nxt_l, jnp.int32)

        def admit(st):
            cache, tok, rid, left, out, olen, nxt_l = st
            slot = jnp.argmax(rid == R)            # first free slot
            li = nxt_l
            newc = dict(cache)
            for key in staging:
                src = jax.lax.dynamic_slice(
                    staging[key],
                    (0, li) + (0,) * (staging[key].ndim - 2),
                    (staging[key].shape[0], 1) + staging[key].shape[2:])
                newc[key] = jax.lax.dynamic_update_slice(
                    cache[key], src.astype(cache[key].dtype),
                    (0, slot) + (0,) * (cache[key].ndim - 2))
            newc["pos"] = cache["pos"].at[slot].set(wlen[li])
            tok = tok.at[slot].set(wfirst[li])
            rid = rid.at[slot].set(wrid[li])
            budget = wnew[li] - 1       # the first token is pre-sampled
            if eos_id is not None:
                budget = jnp.where(wfirst[li] == eos_id, 0, budget)
            left = left.at[slot].set(budget)
            out = out.at[wrid[li], 0].set(wfirst[li])
            olen = olen.at[wrid[li]].set(1)
            return newc, tok, rid, left, out, olen, nxt_l + 1

        def loop_cond(st):
            i, _, _, _, rid, left, _, _, nxt_l = st
            alive = jnp.any((rid < R) & (left > 0))
            return (i < sync_steps) & (alive | (nxt_l < wcount))

        def body(st):
            i, cache, tok, rng, rid, left, out, olen, nxt_l = st
            # retire: exhausted slots park at the sentinel (their last
            # token was recorded on the iteration that produced it)
            done = (rid < R) & (left <= 0)
            rid = jnp.where(done, R, rid)
            cache = dict(cache)
            cache["pos"] = jnp.where(done, S, cache["pos"])
            # admit at most one staged request per iteration
            can = jnp.any(rid == R) & (nxt_l < wcount)
            cache, tok, rid, left, out, olen, nxt_l = jax.lax.cond(
                can, admit, lambda st: st,
                (cache, tok, rid, left, out, olen, nxt_l))
            # decode every slot one token
            logits, cache = step(params, cache, tok)
            rng, sub = jax.random.split(rng)
            nxt = sample(logits, sub)
            live = (rid < R) & (left > 0)
            row = jnp.where(live, rid, R)
            col = jnp.clip(olen[row], 0, MAXNEW - 1)
            out = out.at[row, col].set(jnp.where(live, nxt, out[row, col]))
            olen = olen.at[row].add(live.astype(olen.dtype))
            left = jnp.where(live, left - 1, left)
            if eos_id is not None:
                left = jnp.where(live & (nxt == eos_id), 0, left)
            tok = jnp.where(live, nxt, tok)
            return (i + 1, cache, tok, rng, rid, left, out, olen, nxt_l)

        st = (jnp.asarray(0, jnp.int32), cache, tok, rng, rid, left, out,
              olen, nxt_l)
        st = jax.lax.while_loop(loop_cond, body, st)
        _, cache, tok, rng, rid, left, out, olen, nxt_l = st
        live_n = jnp.sum((rid < R) & (left > 0))
        return cache, tok, rng, rid, left, out, olen, nxt_l, live_n

    # donate the cache and the output buffer: both rebind every call
    return jax.jit(macro, donate_argnums=(1, 6))


class DeviceBatchingEngine:
    """Continuous batching with DEVICE-SIDE admission (see the section
    comment above): staged batched prefill + one jitted scan that
    retires, admits and decodes. Offline/batch serving semantics — the
    submitted set is staged in waves of ``wave`` requests; an online
    server would stage arrivals the same way between macro calls.

    Same client API as BatchingEngine (submit / run / reset); greedy by
    default. Single-device only (the tp decode mesh stays on the host
    scheduler). max_new is capped at max_seq - len(prompt) like the host
    engine."""

    def __init__(self, params, cfg: GptConfig, slots: int = 8,
                 sync_steps: int = 64, wave: int = 16,
                 buckets=DEFAULT_BUCKETS, eos_id: int | None = None,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 0.0, seed: int = 0,
                 prefill_rows: int | None = None,
                 use_pallas: bool | None = None):
        import jax
        import jax.numpy as jnp
        import numpy as np

        self._np, self._jnp, self._jax = np, jnp, jax
        self.cfg, self.slots, self.sync_steps = cfg, slots, sync_steps
        self.wave = wave
        self.eos_id = eos_id
        self.buckets = tuple(b for b in sorted(buckets) if b <= cfg.max_seq)
        if not self.buckets:
            raise ValueError("no bucket fits max_seq")
        self.prefill_rows = prefill_rows or min(slots, wave)
        self.params = params
        self._sparams = (params if isinstance(params.get("blocks"), dict)
                         else stack_params(params))
        self._stage_fn = make_stage_prefill(cfg, temperature, top_k,
                                            top_p, use_pallas)
        self._macro = make_device_loop(cfg, sync_steps, temperature,
                                       top_k, top_p, eos_id)
        self._seed = seed
        self.reset()

    # -- client API ---------------------------------------------------------
    def reset(self) -> None:
        self._rng = self._jax.random.PRNGKey(self._seed)
        # (row, rid, prompt, new): row indexes the run's out buffer
        # (run-local), rid is the client-visible id (unique across runs)
        self._reqs: list[tuple[int, int, object, int]] = []
        self.finished: dict[int, list[int]] = {}
        self._next_rid = 0

    def submit(self, ids, max_new: int = 32) -> int:
        np = self._np
        ids = np.asarray(ids, np.int32).reshape(-1)
        if ids.size == 0 or ids.size > self.buckets[-1]:
            raise ValueError(f"prompt length {ids.size} outside "
                             f"(0, {self.buckets[-1]}]")
        rid = self._next_rid
        self._next_rid += 1
        new = max(1, min(max_new, self.cfg.max_seq - ids.size))
        self._reqs.append((len(self._reqs), rid, ids, new))
        return rid

    def _bucket(self, n: int) -> int:
        return next(b for b in self.buckets if b >= n)

    def _stage(self, reqs, rng):
        """Prefill one wave (sorted by bucket, batched in fixed
        prefill_rows chunks per bucket so compiles stay one-per-bucket)
        into a fresh staging buffer; returns (staging, meta, rng)."""
        np, jnp, jax = self._np, self._jnp, self._jax
        PG = self.prefill_rows
        staging = init_staging(self.cfg, self.wave + PG)
        W = self.wave
        wlen = np.zeros(W, np.int32)
        wnew = np.zeros(W, np.int32)
        wfirst = np.zeros(W, np.int32)
        wrid = np.full(W, len(self._reqs), np.int32)
        reqs = sorted(reqs, key=lambda r: self._bucket(len(r[2])))
        offset = 0
        while offset < len(reqs):
            bucket = self._bucket(len(reqs[offset][2]))
            group = [r for r in reqs[offset:offset + PG]
                     if self._bucket(len(r[2])) == bucket]
            ids = np.zeros((PG, bucket), np.int32)
            lens = np.ones(PG, np.int32)
            for j, (_, _, p, _) in enumerate(group):
                ids[j, :len(p)] = p
                lens[j] = len(p)
            rng, sub = jax.random.split(rng)
            staging, firsts = self._stage_fn(
                self._sparams, jnp.asarray(ids), jnp.asarray(lens),
                staging, offset, sub)
            firsts = np.asarray(firsts)
            for j, (row, _, p, new) in enumerate(group):
                wlen[offset + j] = len(p)
                wnew[offset + j] = new
                wfirst[offset + j] = firsts[j]
                wrid[offset + j] = row
            offset += len(group)
        meta = tuple(jnp.asarray(a) for a in (wlen, wnew, wfirst, wrid)) \
            + (jnp.asarray(len(reqs), jnp.int32),)
        return staging, meta, rng

    def run(self) -> dict[int, list[int]]:
        """Stage waves and drive macro steps until every request is done;
        returns {rid: token list} (first token included, EOS recorded)."""
        np, jnp = self._np, self._jnp
        if not self._reqs:
            return self.finished
        R = len(self._reqs)
        maxnew = max(new for _, _, _, new in self._reqs)
        cache = init_slot_cache(self.cfg, self.slots)
        tok = jnp.zeros((self.slots,), jnp.int32)
        rid = jnp.full((self.slots,), R, jnp.int32)
        left = jnp.zeros((self.slots,), jnp.int32)
        out = jnp.zeros((R + 1, maxnew), jnp.int32)
        olen = jnp.zeros((R + 1,), jnp.int32)
        waves = [self._reqs[i:i + self.wave]
                 for i in range(0, R, self.wave)]
        wi = 0
        staging, meta, self._rng = self._stage(waves[0], self._rng)
        self._rng, dev_rng = self._jax.random.split(self._rng)
        nxt_l = 0
        while True:
            (cache, tok, dev_rng, rid, left, out, olen, nxt_l_d,
             live_n) = self._macro(self.params, cache, tok, dev_rng, rid,
                                   left, out, olen, nxt_l, staging, *meta)
            nxt_l = int(nxt_l_d)        # the one host sync per macro
            if nxt_l >= len(waves[wi]):
                if wi + 1 < len(waves):
                    wi += 1
                    staging, meta, self._rng = self._stage(
                        waves[wi], self._rng)
                    nxt_l = 0
                elif int(live_n) == 0:
                    break
        out, olen = np.asarray(out), np.asarray(olen)
        for row, rid_, _, _ in self._reqs:
            self.finished[rid_] = out[row, :olen[row]].tolist()
        self._reqs = []
        return self.finished
