"""HTTP generation server for the token LM (the second workload).

Net-new serving surface: the reference ships no generation code at all for
its LSTM LM (train_music_lstm_v2.py trains and checkpoints only); here the
sampler (models/lm_sampling.py) plus optionally the exported codec serve
genre-conditioned continuation over HTTP:

  GET  /healthz    -> JSON {ok, vocab_size, num_genres, has_codec, ...}
  POST /generate   JSON body:
      {"genre": 0, "length": 512,            # required
       "n": 1,                               # samples (batched generation)
       "temperature": 1.0, "top_k": 0, "top_p": 0.0,
       "seed": 1234,                         # omit -> fresh entropy
       "prompt_tokens": [..],                # optional continuation prefix
       "decode": false}                      # true -> also codec-decode
    -> .npy (n, length) int32 tokens, or .npz {tokens, mel} with decode
       (mel (n, length, mel_channels) from the exported codec).

Design notes:
* requested lengths round up to a `length_grid` multiple before the
  sampling scan and trim after, so the compiled-shape set stays bounded;
* specials (pad/BOS and any id past the codec codebook) are masked out of
  the sampling distribution whenever a codec is attached, so every sampled
  stream decodes meaningfully (same policy as examples/music_continuation);
* one generation runs at a time (a lock serializes requests) — generation
  is a long device scan, and unbounded concurrent scans would only fight
  for the chip.

CLI:  python -m mqgan_tpu.deploy.http_lm --lm_run RUN_DIR
      [--codec_dir EXPORT] [--port 8767] [--max_length 8192]
  or  --lm_export DIR instead of --lm_run: serve an AOT-exported LM
      artifact (deploy/export_lm.py) — generation lengths then ride the
      exported (prompt, generation) buckets instead of --length_grid,
      and the host needs no checkpoint or model code.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from mqgan_tpu.deploy.http_server import _HTTPError, _npy_bytes, _npz_bytes

MAX_SAMPLES = 16


class LMHTTPService:
    def __init__(self, lm_run: Optional[str] = None,
                 codec_dir: Optional[str] = None,
                 *, length_grid: int = 128, max_length: int = 8192,
                 lm_export: Optional[str] = None):
        """Serve from a training run dir (checkpoint + flax model) OR
        from an AOT-exported artifact dir (deploy/export_lm.py) — the
        latter needs no checkpoint or model code on the serving host."""
        if (lm_run is None) == (lm_export is None):
            raise ValueError("pass exactly one of lm_run / lm_export")
        self.exported = None
        if lm_export is not None:
            from mqgan_tpu.deploy.export_lm import ExportedMusicLM

            self.exported = ExportedMusicLM(lm_export)
            m = self.exported.manifest
            self.lm_args = {
                "vocab_size": m["vocab_size"],
                "num_genres": m["num_genres"],
                "bos_id": m["bos_id"], "pad_id": m["pad_id"],
            }
            # exported programs exist only up to the largest gen bucket
            max_length = min(max_length, self.exported.gen_buckets[-1])
        else:
            from mqgan_tpu.deploy.export_lm import load_lm_from_run

            self.model, self.params, self.lm_args = load_lm_from_run(
                lm_run)
        a = self.lm_args
        self.codec = None
        if codec_dir:
            from mqgan_tpu.deploy.runtime import ExportedPreEncoder

            self.codec = ExportedPreEncoder(codec_dir)
        self.length_grid = int(length_grid)
        self.max_length = int(max_length)
        self._lock = threading.Lock()
        # same special-token policy as examples/music_continuation.py: with
        # a codec attached, anything that cannot decode is unsampleable
        forbidden = {a["pad_id"], a["bos_id"]}
        if self.codec is not None:
            forbidden |= set(range(self.codec.codebook_size,
                                   a["vocab_size"]))
        self.forbidden = tuple(sorted(forbidden))

    # ------------------------------------------------------------------
    def health(self) -> dict:
        out = {
            "ok": True,
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

    def generate(self, spec: dict) -> tuple[bytes, str]:
        import jax
        import jax.numpy as jnp

        from mqgan_tpu.models.lm_sampling import generate_tokens

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
        with self._lock:
            if self.exported is not None:
                tokens = self.exported.generate(
                    np.full((n,), genre, np.int32), length,
                    seed=int(np.uint32(seed).astype(np.int32)),
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    prompt=(None if prompt_np is None
                            else np.tile(prompt_np[None], (n, 1))),
                    forbidden=self.forbidden,
                ).astype(np.int32)
            else:
                prompt = (None if prompt_np is None
                          else jnp.tile(prompt_np[None], (n, 1)))
                # bound the compiled-shape set: sample on a length grid,
                # trim after
                padded = -(-length // self.length_grid) * self.length_grid
                tokens = generate_tokens(
                    self.model, self.params,
                    jnp.full((n,), genre, jnp.int32),
                    jax.random.key(int(seed)), max_len=padded,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    bos_id=self.lm_args["bos_id"], prompt=prompt,
                    forbidden_tokens=self.forbidden,
                )
                tokens = np.asarray(tokens)[:, :length].astype(np.int32)
            if decode:
                mel = self.codec.decode(tokens)
                return (_npz_bytes(tokens=tokens, mel=mel),
                        "application/x-npz")
        return _npy_bytes(tokens), "application/x-npy"

    def close(self):
        pass  # nothing background to stop; symmetry with the codec services


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
                    "HTTP.")
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
    args = p.parse_args(argv)

    service = LMHTTPService(args.lm_run, args.codec_dir,
                            length_grid=args.length_grid,
                            max_length=args.max_length,
                            lm_export=args.lm_export)
    server = LMHTTPServer(service, host=args.host, port=args.port)
    print(f"serving LM generation from {args.lm_run or args.lm_export} "
          f"on {server.url} (codec: {args.codec_dir or 'none'})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == "__main__":
    main()
