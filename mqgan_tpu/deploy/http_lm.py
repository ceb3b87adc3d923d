"""HTTP generation server for the token LM (the second workload).

Net-new serving surface: the reference ships no generation code at all for
its LSTM LM (train_music_lstm_v2.py trains and checkpoints only); here the
served samplers (models/lm_sampling.py) plus optionally the exported codec
serve genre-conditioned continuation over HTTP:

  GET  /healthz    -> JSON {ok, vocab_size, num_genres, arch, ...}
  GET  /statz      -> JSON continuous-batching stats
  POST /generate   JSON body:
      {"genre": 0, "length": 512,            # required
       "n": 1,                               # samples (n batched rows)
       "temperature": 1.0, "top_k": 0, "top_p": 0.0,
       "seed": 1234,                         # omit -> fresh entropy
       "prompt_tokens": [..],                # optional continuation prefix
       "decode": false}                      # true -> also codec-decode
    -> .npy (n, length) int32 tokens, or .npz {tokens, mel} with decode
       (mel (n, length, mel_channels) from the exported codec).

CONTINUOUS BATCHING (round-4): concurrent /generate requests no longer
serialize behind a lock — a background worker coalesces every pending
request whose (prompt-bucket, gen-bucket, temperature, top_k, top_p)
group matches into ONE dispatch of the per-row served sampler
(generate_tokens_served / generate_tokens_transformer_served): per-row
seeds and prompt lengths ride one batch, so mixed-length prompts share
the MXU. Because the served samplers are row-for-row solo-exact
(tests/test_lm_sampling.py), coalescing is invisible to clients — each
response is bit-identical to the same request served alone. This is the
StreamingCodecServer pattern (deploy/streaming_server.py) applied to
generation.

Both token-LM architectures serve identically (models/token_lm.py
resolves `arch` from the run's best.json or the export manifest).

Design notes:
* requested lengths round up to a `length_grid` multiple (checkpoint
  backend) or the exported generation buckets before the sampling scan
  and trim after, so the compiled-shape set stays bounded; prompts
  likewise ride a small bucket grid;
* specials (pad/BOS and any id past the codec codebook) are masked out of
  the sampling distribution whenever a codec is attached, so every sampled
  stream decodes meaningfully (same policy as examples/music_continuation);
* a request with n samples occupies n rows with per-row seeds
  seed, seed+1, ..., seed+n-1 (the ExportedMusicLM.generate policy).

CLI:  python -m mqgan_tpu.deploy.http_lm --lm_run RUN_DIR
      [--codec_dir EXPORT] [--port 8767] [--max_length 8192]
      [--max_batch 16] [--max_delay_ms 3]
  or  --lm_export DIR instead of --lm_run: serve an AOT-exported LM
      artifact (deploy/export_lm.py) — generation lengths then ride the
      exported (prompt, generation) buckets instead of --length_grid,
      and the host needs no checkpoint or model code.
"""

from __future__ import annotations

import json
import os
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from mqgan_tpu.deploy.http_server import _HTTPError, _npy_bytes, _npz_bytes
from mqgan_tpu.deploy.server import ServerStats

MAX_SAMPLES = 16


@dataclass
class _GenReq:
    """One /generate call, expanded to its batch rows at flush time."""

    key: tuple  # (p_bucket, l_bucket, temperature, top_k, top_p)
    genre: int
    seed: int
    n: int
    length: int
    prompt: Optional[np.ndarray]  # (P,) int32 or None
    future: Future = field(default_factory=Future)
    t_submit: float = field(default_factory=time.monotonic)


class _LMBatcher:
    """Coalesce same-group generation requests into one batched dispatch.

    rows_fn(genres (B,), seeds (B,), prompts list, length, temperature,
    top_k, top_p) -> (B, length) int32 — the per-row primitive both
    backends expose. Grouping is by (prompt-bucket, gen-bucket, sampling
    params); per-row seeds/prompt lengths mean any rows WITHIN a group
    share one compiled dispatch. Same linger-then-flush policy as
    deploy/server.py / streaming_server.py.
    """

    def __init__(self, rows_fn, max_batch: int, max_delay_s: float):
        self.rows_fn = rows_fn
        self.max_batch = int(max_batch)
        self.max_delay_s = float(max_delay_s)
        self.stats = ServerStats()
        # (p_bucket, l_bucket, width) triples already compiled: a dispatch
        # shape's FIRST execution pays the XLA compile (sampling params
        # are traced values and do not retrace), so requests riding it are
        # classified cold in the stats; warmup() pre-seeds this set
        self._seen_shapes: set[tuple] = set()
        self._queue: deque[_GenReq] = deque()
        self._cond = threading.Condition()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, req: _GenReq) -> Future:
        with self._cond:
            if self._closed:
                raise RuntimeError("server is closed")
            self._queue.append(req)
            self.stats.requests += 1
            self.stats.queued += 1
            self._cond.notify_all()
        return req.future

    def close(self):
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        self._worker.join()
        for r in self._queue:
            if not r.future.done():
                r.future.set_exception(RuntimeError("server closed"))

    # ------------------------------------------------------------------
    def _rows_for(self, key) -> int:
        return sum(r.n for r in self._queue if r.key == key)

    def _run(self):
        while True:
            with self._cond:
                while not self._queue and not self._closed:
                    self._cond.wait()
                if not self._queue and self._closed:
                    return
                head = self._queue[0]
                deadline = head.t_submit + self.max_delay_s
                while (self._rows_for(head.key) < self.max_batch
                       and not self._closed):
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cond.wait(timeout=remaining)
                batch, rows, rest = [], 0, deque()
                while self._queue:
                    r = self._queue.popleft()
                    # the head always dispatches (even if its n alone
                    # exceeds max_batch) so the queue can never stall
                    if (r.key == head.key
                            and (not batch
                                 or rows + r.n <= self.max_batch)):
                        batch.append(r)
                        rows += r.n
                    else:
                        rest.append(r)
                self._queue = rest
                self.stats.queued -= len(batch)
                if rest:
                    # other groups (or overflow) are still pending
                    self._cond.notify_all()
            if batch:
                self._flush(head.key, batch)

    def _flush(self, key, batch):
        p_bucket, l_bucket, temperature, top_k, top_p = key
        try:
            genres, seeds, prompts = [], [], []
            for r in batch:
                for i in range(r.n):
                    genres.append(r.genre)
                    seeds.append(np.int32(np.uint32(r.seed + i)))
                    prompts.append(r.prompt)
            # pad the dispatch WIDTH to a power of two: every distinct
            # batch width is a separate XLA compile (multi-second through
            # a remote tunnel), so without the grid a coalescing split
            # like 6+2 triggers fresh compiles mid-traffic (measured:
            # 28 s/round vs 0.13 warm). Dummy rows are free correctness-
            # wise — the per-row samplers make rows independent (the
            # batch-composition-invariance tests).
            real = len(genres)
            width = 1
            while width < real:
                width *= 2
            for _ in range(width - real):
                genres.append(0)
                seeds.append(np.int32(0))
                prompts.append(None)
            shape = (p_bucket, l_bucket, width)
            cold = shape not in self._seen_shapes
            out = self.rows_fn(
                np.asarray(genres, np.int32), np.asarray(seeds, np.int32),
                prompts, p_bucket, l_bucket, temperature, top_k, top_p)
            out = np.asarray(out).astype(np.int32)[:real]
            now = time.monotonic()
            with self._cond:
                self._seen_shapes.add(shape)
                self.stats.batches += 1
                self.stats.rows += real
                for r in batch:
                    lat = (now - r.t_submit) * 1e3
                    self.stats.latencies_ms.append(lat)
                    (self.stats.cold_latencies_ms if cold
                     else self.stats.warm_latencies_ms).append(lat)
            row = 0
            for r in batch:
                r.future.set_result(out[row: row + r.n, : r.length])
                row += r.n
        except Exception as e:  # noqa: BLE001 — fail the whole batch loudly
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)


class LMHTTPService:
    def __init__(self, lm_run: Optional[str] = None,
                 codec_dir: Optional[str] = None,
                 *, length_grid: int = 128, max_length: int = 8192,
                 lm_export: Optional[str] = None,
                 prompt_grid: int = 16, max_batch: int = MAX_SAMPLES,
                 max_delay_ms: float = 3.0, kv_bf16: bool = False):
        """Serve from a training run dir (checkpoint + flax model) OR
        from an AOT-exported artifact dir (deploy/export_lm.py) — the
        latter needs no checkpoint or model code on the serving host.
        Either backend serves both token-LM architectures."""
        if (lm_run is None) == (lm_export is None):
            raise ValueError("pass exactly one of lm_run / lm_export")
        self.exported = None
        if lm_export is not None:
            from mqgan_tpu.deploy.export_lm import ExportedMusicLM

            self.exported = ExportedMusicLM(lm_export)
            m = self.exported.manifest
            self.arch = self.exported.arch
            self.lm_args = {
                "vocab_size": m["vocab_size"],
                "num_genres": m["num_genres"],
                "bos_id": m["bos_id"], "pad_id": m["pad_id"],
            }
            # exported programs exist only up to the largest gen bucket
            max_length = min(max_length, self.exported.gen_buckets[-1])
        else:
            from mqgan_tpu.deploy.export_lm import load_lm_from_run
            from mqgan_tpu.models.token_lm import lm_arch, served_sampler

            self.model, self.params, self.lm_args = load_lm_from_run(
                lm_run)
            self.arch = lm_arch(self.model)
            self._sampler = served_sampler(self.model)
            if kv_bf16 and self.arch == "transformer":
                # bf16 KV cache: 1.71x decode (3.05 -> 1.79 ms/token at
                # B=64 L=512, results_r5_kv_decode.json); streams are
                # self-consistent per dtype (per-row solo-exact within
                # bf16) but differ from fp32-cache streams by rounding
                import jax.numpy as jnp
                from functools import partial

                self._sampler = partial(self._sampler,
                                        kv_dtype=jnp.bfloat16)
            self._jitted = {}  # max_len -> jitted served sampler
        a = self.lm_args
        self.codec = None
        self._codec_lock = threading.Lock()
        if codec_dir:
            from mqgan_tpu.deploy.runtime import ExportedPreEncoder

            self.codec = ExportedPreEncoder(codec_dir)
        self.length_grid = int(length_grid)
        self.prompt_grid = int(prompt_grid)
        self.max_length = int(max_length)
        # same special-token policy as examples/music_continuation.py: with
        # a codec attached, anything that cannot decode is unsampleable
        forbidden = {a["pad_id"], a["bos_id"]}
        if self.codec is not None:
            forbidden |= set(range(self.codec.codebook_size,
                                   a["vocab_size"]))
        self.forbidden = tuple(sorted(forbidden))
        self._vocab_mask = np.ones((a["vocab_size"],), bool)
        self._vocab_mask[list(self.forbidden)] = False
        self.batcher = _LMBatcher(self._generate_rows, max_batch,
                                  float(max_delay_ms) / 1e3)

    # ------------------------------------------------------------------
    def _buckets_for(self, length: int, prompt_len: int) -> tuple[int, int]:
        """(p_bucket, l_bucket) a request rides — the batcher group axes."""
        if self.exported is not None:
            rt = self.exported
            l_bucket = rt._bucket(rt.gen_buckets, length, "length")
            p_bucket = rt._bucket(rt.prompt_buckets, max(prompt_len, 1),
                                  "prompt length")
        else:
            grid = self.length_grid
            l_bucket = -(-length // grid) * grid
            p_bucket = (1 if prompt_len == 0 else
                        -(-prompt_len // self.prompt_grid)
                        * self.prompt_grid)
        return p_bucket, l_bucket

    def _generate_rows(self, genres, seeds, prompts, p_bucket, l_bucket,
                       temperature, top_k, top_p) -> np.ndarray:
        """The batcher's dispatch: per-row (genre, seed, prompt) rows at
        one (P, L) bucket pair and one sampling-params triple."""
        if self.exported is not None:
            return self.exported.generate_rows(
                genres, seeds, l_bucket, prompts=prompts,
                temperature=temperature, top_k=top_k, top_p=top_p,
                forbidden=self.forbidden)
        import jax
        import jax.numpy as jnp
        from functools import partial

        b = genres.shape[0]
        p_lens = np.asarray(
            [0 if p is None else len(p) for p in prompts], np.int32)
        prompt_arr = np.zeros((b, p_bucket), np.int32)
        for i, p in enumerate(prompts):
            if p is not None:
                prompt_arr[i, : p_lens[i]] = p
        fn = self._jitted.get(l_bucket)
        if fn is None:
            fn = jax.jit(partial(self._sampler, self.model, self.params,
                                 max_len=l_bucket,
                                 bos_id=self.lm_args["bos_id"]))
            self._jitted[l_bucket] = fn
        out = fn(jnp.asarray(genres), jnp.asarray(seeds),
                 jnp.asarray(prompt_arr), jnp.asarray(p_lens),
                 jnp.float32(temperature), jnp.int32(top_k),
                 jnp.float32(top_p), jnp.asarray(self._vocab_mask))
        return np.asarray(out)

    # ------------------------------------------------------------------
    def warmup(self, lengths=None, prompt_lens=None,
               verbose: bool = False) -> int:
        """Compile the dispatch-shape grid BEFORE accepting traffic.

        Every (prompt-bucket, gen-bucket, pow2 width) triple is a separate
        XLA compile (multi-second each through a remote tunnel); without
        pre-warming, those compiles land in served requests' latency — the
        round-4 overload test measured a 28 s p95 that was entirely cold
        compiles (VERDICT r4 Weak #3). Same principle as the reference
        export's warm-up-before-use (convert_to_torchscript.py:57-76),
        applied serving-side.

        lengths: generation lengths to cover (default: every exported gen
        bucket, or one length_grid for the checkpoint backend).
        prompt_lens: prompt lengths to cover (default: promptless, plus
        every exported prompt bucket on the exported backend — checkpoint
        callers pass e.g. (0, 16) to widen).
        Returns the number of shapes executed."""
        if lengths is None:
            lengths = (tuple(self.exported.gen_buckets)
                       if self.exported is not None
                       else (self.length_grid,))
        if prompt_lens is None:
            prompt_lens = ((0,) + tuple(self.exported.prompt_buckets)
                           if self.exported is not None else (0,))
        widths = []
        w = 1
        while w <= self.batcher.max_batch:
            widths.append(w)
            w *= 2
        shapes = []
        for length in lengths:
            for p_len in prompt_lens:
                p_bucket, l_bucket = self._buckets_for(
                    min(int(length), self.max_length), int(p_len))
                for width in widths:
                    s = (p_bucket, l_bucket, width)
                    if s not in shapes:
                        shapes.append(s)
        n = 0
        for p_bucket, l_bucket, width in shapes:
            if (p_bucket, l_bucket, width) in self.batcher._seen_shapes:
                continue
            t0 = time.monotonic()
            genres = np.zeros((width,), np.int32)
            seeds = np.zeros((width,), np.int32)
            # one row carries a full-bucket dummy prompt so the dispatch
            # rides (and compiles) exactly the (p_bucket, l_bucket) pair
            prompts = [None] * width
            if p_bucket > 1 or (self.exported is None and p_bucket == 1):
                prompts[0] = np.zeros((p_bucket,), np.int32)
            self._generate_rows(genres, seeds, prompts, p_bucket, l_bucket,
                                1.0, 0, 0.0)
            self.batcher._seen_shapes.add((p_bucket, l_bucket, width))
            n += 1
            if verbose:
                print(f"warmup P={p_bucket} L={l_bucket} B={width}: "
                      f"{time.monotonic() - t0:.2f}s", flush=True)
        return n

    # ------------------------------------------------------------------
    def health(self) -> dict:
        out = {
            "ok": True,
            "arch": self.arch,
            "vocab_size": self.lm_args["vocab_size"],
            "num_genres": self.lm_args["num_genres"],
            "bos_id": self.lm_args["bos_id"],
            "pad_id": self.lm_args["pad_id"],
            "max_length": self.max_length,
            "has_codec": self.codec is not None,
            "backend": "exported" if self.exported is not None
                       else "checkpoint",
        }
        if self.codec is not None:
            out["mel_channels"] = self.codec.mel_channels
            out["codebook_size"] = self.codec.codebook_size
        return out

    def stats(self) -> dict:
        return self.batcher.stats.summary()

    def generate(self, spec: dict) -> tuple[bytes, str]:
        try:
            genre = int(spec["genre"])
            length = int(spec["length"])
        except (KeyError, TypeError, ValueError) as e:
            raise _HTTPError(400, f"generate needs integer 'genre' and "
                                  f"'length': {e}")
        if not (0 <= genre < self.lm_args["num_genres"]):
            raise _HTTPError(400, f"genre {genre} outside "
                                  f"[0, {self.lm_args['num_genres']})")
        if not (1 <= length <= self.max_length):
            raise _HTTPError(413, f"length {length} outside "
                                  f"[1, {self.max_length}]")
        n = int(spec.get("n", 1))
        if not (1 <= n <= MAX_SAMPLES):
            raise _HTTPError(400, f"n {n} outside [1, {MAX_SAMPLES}]")
        decode = bool(spec.get("decode", False))
        if decode and self.codec is None:
            raise _HTTPError(400, "decode requested but the server has no "
                                  "--codec_dir attached")
        prompt_np = None
        if spec.get("prompt_tokens"):
            try:
                prompt_np = np.asarray(spec["prompt_tokens"], np.int32)
            except (TypeError, ValueError) as e:
                raise _HTTPError(400, f"prompt_tokens must be a flat int "
                                      f"list: {e}")
            if prompt_np.ndim != 1 or prompt_np.size == 0:
                raise _HTTPError(400, "prompt_tokens must be a non-empty "
                                      "flat int list")
            if not ((0 <= prompt_np) &
                    (prompt_np < self.lm_args["vocab_size"])).all():
                raise _HTTPError(400, "prompt_tokens outside the vocab")
            if (self.exported is not None and prompt_np.size
                    > self.exported.prompt_buckets[-1]):
                raise _HTTPError(
                    413, f"prompt length {prompt_np.size} exceeds the "
                         f"largest exported prompt bucket "
                         f"{self.exported.prompt_buckets[-1]}")
        seed = spec.get("seed")
        if seed is None:
            seed = int.from_bytes(os.urandom(4), "little")
        temperature = float(spec.get("temperature", 1.0))
        top_k = int(spec.get("top_k", 0))
        top_p = float(spec.get("top_p", 0.0))

        p_bucket, l_bucket = self._buckets_for(
            length, 0 if prompt_np is None else prompt_np.size)
        req = _GenReq(
            key=(p_bucket, l_bucket, temperature, top_k, top_p),
            genre=genre, seed=int(np.uint32(seed)), n=n, length=length,
            prompt=prompt_np)
        tokens = self.batcher.submit(req).result()
        if decode:
            with self._codec_lock:
                mel = self.codec.decode(tokens)
            return (_npz_bytes(tokens=tokens, mel=mel),
                    "application/x-npz")
        return _npy_bytes(tokens), "application/x-npy"

    def close(self):
        self.batcher.close()


class _LMHandler(BaseHTTPRequestHandler):
    service: LMHTTPService = None
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):
        pass

    def _reply(self, status, body, content_type):
        self.send_response(status)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _reply_json(self, status, obj):
        self._reply(status, json.dumps(obj).encode(), "application/json")

    def do_GET(self):
        if self.path == "/healthz":
            self._reply_json(200, self.service.health())
        elif self.path == "/statz":
            self._reply_json(200, self.service.stats())
        else:
            self._reply_json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        if self.path != "/generate":
            self._reply_json(404, {"error": f"unknown path {self.path}"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            try:
                spec = json.loads(self.rfile.read(n) if n else b"{}")
            except json.JSONDecodeError as e:
                raise _HTTPError(400, f"generate expects a JSON body: {e}")
            body, ctype = self.service.generate(spec)
        except _HTTPError as e:
            self._reply_json(e.status, {"error": e.message})
            return
        except Exception as e:  # noqa: BLE001 — never kill the conn thread
            self._reply_json(500, {"error": f"{type(e).__name__}: {e}"})
            return
        self._reply(200, body, ctype)


class LMHTTPServer:
    def __init__(self, service: LMHTTPService, host: str = "127.0.0.1",
                 port: int = 0):
        self.service = service
        handler = type("_BoundLMHandler", (_LMHandler,),
                       {"service": service})
        # stdlib default listen backlog is 5: a burst of concurrent
        # clients beyond it gets TCP connection-reset before accept()
        # (hit at 32 clients in the round-5 serving bench) — widen it
        ThreadingHTTPServer.request_queue_size = 128
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._httpd.daemon_threads = True
        self._thread = None

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self):
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def serve_forever(self):
        self._httpd.serve_forever()

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join()
        self.service.close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.close()


def main(argv=None):
    import argparse

    from mqgan_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(
        description="Serve token-LM generation (and codec decode) over "
                    "HTTP with continuous batching.")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--lm_run",
                     help="lstm_trainer out_dir (reads best.json + ckpt)")
    src.add_argument("--lm_export",
                     help="AOT-exported LM dir (deploy.export_lm) — no "
                          "checkpoint needed on the serving host")
    p.add_argument("--codec_dir", default=None,
                   help="exported codec dir: enables decode=true responses "
                        "and masks undecodable specials out of sampling")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8767)
    p.add_argument("--max_length", type=int, default=8192)
    p.add_argument("--length_grid", type=int, default=128)
    p.add_argument("--max_batch", type=int, default=MAX_SAMPLES,
                   help="max coalesced rows per generation dispatch")
    p.add_argument("--max_delay_ms", type=float, default=3.0,
                   help="linger before dispatching a short batch")
    p.add_argument("--kv_bf16", action="store_true",
                   help="run-dir transformer backend: bf16 KV cache "
                        "(1.71x decode, results_r5_kv_decode.json); "
                        "streams self-consistent but not bit-equal to "
                        "fp32-cache runs. Exported backends bake the "
                        "cache dtype at export time (--kv_bf16 there)")
    p.add_argument("--no_prewarm", action="store_true",
                   help="skip compiling the dispatch-shape grid (pow2 "
                        "widths x generation/prompt buckets) before "
                        "accepting traffic — first requests per shape "
                        "then pay multi-second XLA compiles (reported "
                        "separately as cold latencies in /statz)")
    p.add_argument("--prewarm_lengths", type=int, nargs="+", default=None,
                   help="generation lengths to pre-compile (default: all "
                        "exported gen buckets, or one --length_grid for "
                        "the checkpoint backend)")
    args = p.parse_args(argv)

    service = LMHTTPService(args.lm_run, args.codec_dir,
                            length_grid=args.length_grid,
                            max_length=args.max_length,
                            lm_export=args.lm_export,
                            max_batch=args.max_batch,
                            max_delay_ms=args.max_delay_ms,
                            kv_bf16=args.kv_bf16)
    if not args.no_prewarm:
        t0 = time.monotonic()
        n = service.warmup(lengths=args.prewarm_lengths, verbose=True)
        print(f"pre-warmed {n} dispatch shapes in "
              f"{time.monotonic() - t0:.1f}s")
    server = LMHTTPServer(service, host=args.host, port=args.port)
    print(f"serving {service.arch} LM generation from "
          f"{args.lm_run or args.lm_export} on {server.url} "
          f"(codec: {args.codec_dir or 'none'})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == "__main__":
    main()
