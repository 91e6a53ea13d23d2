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
