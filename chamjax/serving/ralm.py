"""RALM generation loops: retrieval-augmented decoding.

Rebuild of the reference's serving layer (``ralm/ralm/ralm.py``):

- ``RalmDecoder``        — decoder-only generation with retrieval every
  ``retrieval_interval`` steps; the retrieval query is the last hidden state
  (``ralm.py:109-118``) or a replayed ``query_set``; per-step timing arrays.
- ``RalmEncoderDecoder`` — enc-dec RALM: a retrieval step encodes the query,
  retrieves k neighbours, encodes k·retrieval_token_len retrieved tokens and
  refreshes the decoder's cross-attention K/V; non-retrieval steps reuse the
  cached encoder output (``ralm.py:307-344``).

Design note (TPU): the decode step is a single jitted program; retrieval
runs on host between device steps through the ``BaseRetriever`` contract,
so Dummy / Local (in-process JAX search) / External (TCP) engines are
interchangeable exactly as in the reference (``ralm.py:125-133``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from chamjax.config import ModelConfig
from chamjax.models import (
    KVCache,
    TransformerParams,
    decoder_step,
    encoder_forward,
    init_kv_cache,
)
from chamjax.models.transformer import build_cross_kv
from chamjax.retrieval.interface import BaseRetriever
from chamjax.serving.profiling import StepProfiler


def _ids_to_tokens(ids: np.ndarray, tokens_per_doc: int, vocab: int,
                   seed: int = 7) -> np.ndarray:
    """Deterministically expand neighbour ids → pseudo token sequences.

    The reference encodes retrieved-document tokens supplied by its corpus;
    for perf-parity benchmarking it synthesizes them.  We derive tokens from
    the ids so results are reproducible and content-dependent."""
    b, k = ids.shape
    base = (ids.astype(np.int64)[:, :, None] * 2654435761 + seed
            + np.arange(tokens_per_doc)[None, None, :] * 40503)
    return np.abs(base % max(vocab - 2, 1)).astype(np.int32).reshape(b, -1) + 1


def _ids_to_tokens_device(ids: jax.Array, tokens_per_doc: int, vocab: int,
                          seed: int = 7) -> jax.Array:
    """Device twin of ``_ids_to_tokens`` so the enc-dec retrieval step never
    leaves the device (uint32 wrapping hash — deterministic, id-dependent;
    not bit-identical to the host twin, which is irrelevant for the
    perf-parity workload)."""
    b, k = ids.shape
    base = (ids.astype(jnp.uint32)[:, :, None] * jnp.uint32(2654435761)
            + jnp.uint32(seed)
            + jnp.arange(tokens_per_doc, dtype=jnp.uint32)[None, None, :]
            * jnp.uint32(40503))
    return (base % jnp.uint32(max(vocab - 2, 1))).astype(jnp.int32
                                                         ).reshape(b, -1) + 1


class RalmDecoder:
    """Decoder-only RALM loop (reference ``ralmDecoder``)."""

    def __init__(
        self,
        params: TransformerParams,
        cfg: ModelConfig,
        retriever: BaseRetriever,
        batch_size: int,
        retrieval_interval: Optional[int] = None,
        nprobe: int = 32,
        k: Optional[int] = None,
        query_set: Optional[np.ndarray] = None,
        use_query_set: bool = False,
    ):
        self.params = params
        self.cfg = cfg
        self.retriever = retriever
        self.batch = batch_size
        self.interval = retrieval_interval or cfg.retrieval_interval
        self.nprobe = nprobe
        self.k = k or cfg.k
        self.query_set = query_set      # (steps, b, dim) replay buffer
        self.use_query_set = use_query_set
        self.prof = StepProfiler()
        if cfg.model_type == "llama":
            # reference scaffolds this family as ``ralmDecoder_llama``
            # (``ralm/ralm/ralm.py:433-618``); here it is a real model
            from chamjax.models.llama import init_llama_kv_cache, llama_step
            self._step_fn = functools.partial(
                llama_step, heads=cfg.attention_heads,
                kv_heads=cfg.kv_heads, theta=cfg.rope_theta)
            self._cache_fn = functools.partial(
                init_llama_kv_cache, cfg, batch_size)
        else:
            self._step_fn = functools.partial(
                decoder_step, heads=cfg.attention_heads)
            self._cache_fn = functools.partial(
                init_kv_cache, cfg, batch_size)
        self.reset_inference_state()

    def reset_inference_state(self) -> None:
        self.cache: KVCache = self._cache_fn()
        self.tokens = jnp.ones((self.batch,), jnp.int32)
        self.step_count = 0
        self.last_result = None
        self.prof.reset()

    def _query_vector(self, hidden: jax.Array) -> np.ndarray:
        if self.use_query_set and self.query_set is not None:
            return self.query_set[self.step_count % len(self.query_set)]
        return np.asarray(hidden, np.float32)

    @property
    def _device_path(self) -> bool:
        """Fused path: when the retriever can consume device arrays and no
        query replay is requested, the whole step chain (decode → retrieve)
        stays on device with zero per-step host transfers — the reference's
        per-step GPU→host→socket hop eliminated, not just hidden."""
        return (hasattr(self.retriever, "retrieve_device")
                and not self.use_query_set)

    def single_step(self) -> None:
        with self.prof.step_span():
            with self.prof.model_span():
                logits, hidden, self.cache = self._step_fn(
                    self.params, self.tokens, self.cache)
                self.tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                if not self._device_path:
                    hidden.block_until_ready()
            if self.step_count % self.interval == 0:
                with self.prof.retriever_span():
                    if self._device_path:
                        self.last_result = self.retriever.retrieve_device(
                            hidden.astype(jnp.float32), self.nprobe, self.k)
                    else:
                        self.last_result = self.retriever.retrieve(
                            self._query_vector(hidden), self.nprobe, self.k)
            else:
                self.prof.time_retriever.append(0.0)
        self.step_count += 1

    def multi_steps(self, n: int) -> None:
        for _ in range(n):
            self.single_step()

    def batch_inference(self, num_step: Optional[int] = None) -> None:
        """Runs ``num_step`` steps; ``self.total_wall_s`` then holds the
        true wall-clock including a final device sync (per-step spans are
        dispatch times on the fused device path)."""
        import time
        t0 = time.perf_counter()
        self.multi_steps(num_step or self.cfg.max_seq_len)
        # force completion of the full on-device chain
        np.asarray(self.tokens)
        if self.last_result is not None:
            np.asarray(self.last_result.ids).shape
        self.total_wall_s = time.perf_counter() - t0

    def throughput_tokens_per_sec(self, num_step: Optional[int] = None
                                  ) -> float:
        n = num_step or self.step_count
        return self.batch * n / self.total_wall_s

    # profiling surface parity (reference ``get_profiling`` /
    # ``print_profiling_stats``)
    def get_profiling(self):
        return self.prof.get_profiling()

    def print_profiling_stats(self, warmup: int = 0) -> None:
        self.prof.print_stats(self.batch, warmup)


class RalmEncoderDecoder:
    """Encoder-decoder RALM loop (reference ``ralmEncoderDecoder``)."""

    def __init__(
        self,
        enc_params: TransformerParams,
        dec_params: TransformerParams,
        cfg: ModelConfig,
        retriever: BaseRetriever,
        batch_size: int,
        retrieval_interval: Optional[int] = None,
        nprobe: int = 32,
        k: Optional[int] = None,
        retrieval_token_len: Optional[int] = None,
    ):
        self.enc = enc_params
        self.dec = dec_params
        self.cfg = cfg
        self.retriever = retriever
        self.batch = batch_size
        self.interval = retrieval_interval or cfg.retrieval_interval
        self.nprobe = nprobe
        self.k = k or cfg.k
        self.tok_len = retrieval_token_len or cfg.retrieval_token_len
        self.prof = StepProfiler()
        self.reset_inference_state()

    def reset_inference_state(self) -> None:
        self.cache: KVCache = init_kv_cache(self.cfg, self.batch)
        self.tokens = jnp.ones((self.batch,), jnp.int32)
        self.step_count = 0
        self.cross_kv = None
        self.prof.reset()

    def _retrieval_step(self) -> None:
        device_path = hasattr(self.retriever, "retrieve_device")
        # 1. encode the current query token window → query vector
        q_tokens = jnp.broadcast_to(self.tokens[:, None], (self.batch, 1))
        with self.prof.model_span():
            enc_q = encoder_forward(self.enc, q_tokens,
                                    self.cfg.attention_heads)
        # 2. retrieve  3. encode retrieved tokens → fresh decoder cross K/V.
        # With a device-capable retriever the whole chain
        # (encode → search → token synth → encode → cross-KV) stays on
        # device with zero host transfers.
        if device_path:
            with self.prof.retriever_span():
                res = self.retriever.retrieve_device(
                    enc_q[:, -1, :].astype(jnp.float32), self.nprobe, self.k)
            ret_tokens = _ids_to_tokens_device(
                res.ids, self.tok_len, self.cfg.vocab_size
            )[:, : self.cfg.max_seq_len]
        else:
            query = np.asarray(enc_q[:, -1, :], np.float32)
            with self.prof.retriever_span():
                res = self.retriever.retrieve(query, self.nprobe, self.k)
            ids = res.ids if res is not None else np.zeros(
                (self.batch, self.k), np.int64)
            ret_tokens = jnp.asarray(_ids_to_tokens(
                ids, self.tok_len, self.cfg.vocab_size
            )[:, : self.cfg.max_seq_len])
        with self.prof.model_span():
            enc_out = encoder_forward(
                self.enc, ret_tokens, self.cfg.attention_heads)
            self.cross_kv = build_cross_kv(self.dec, enc_out,
                                           self.cfg.attention_heads)
            if not device_path:
                jax.block_until_ready(self.cross_kv)

    def single_step(self) -> None:
        with self.prof.step_span():
            if self.step_count % self.interval == 0 or self.cross_kv is None:
                self._retrieval_step()
            else:
                self.prof.time_retriever.append(0.0)
            with self.prof.model_span():
                logits, hidden, self.cache = decoder_step(
                    self.dec, self.tokens, self.cache,
                    self.cfg.attention_heads, cross_kv=self.cross_kv,
                )
                self.tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                if not hasattr(self.retriever, "retrieve_device"):
                    hidden.block_until_ready()
        self.step_count += 1

    def multi_steps(self, n: int) -> None:
        for _ in range(n):
            self.single_step()

    def batch_inference(self, num_step: Optional[int] = None) -> None:
        """Runs ``num_step`` steps; ``self.total_wall_s`` holds the true
        wall-clock including a final device sync."""
        import time
        t0 = time.perf_counter()
        self.multi_steps(num_step or self.cfg.max_seq_len)
        np.asarray(self.tokens)
        self.total_wall_s = time.perf_counter() - t0

    def throughput_tokens_per_sec(self, num_step: Optional[int] = None
                                  ) -> float:
        n = num_step or self.step_count
        return self.batch * n / self.total_wall_s

    def get_profiling(self):
        return self.prof.get_profiling()

    def print_profiling_stats(self, warmup: int = 0) -> None:
        self.prof.print_stats(self.batch, warmup)
