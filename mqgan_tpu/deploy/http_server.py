"""HTTP front end for the micro-batching codec server.

Net-new deployment surface (the reference stops at the in-process
ScriptedPreEncoder wrapper, scripted_preencoder.py:24-175; its batch tools
are offline CLIs): this module exposes the exported codec over plain HTTP so
non-Python clients (and clients on other machines) can use the TPU server.

Design:
* one `ExportedPreEncoder` (optionally data-parallel over local devices) is
  shared by one `CodecServer` per op — each POST handler thread blocks on
  its request future while the micro-batching workers coalesce concurrent
  clips into bucket-aligned batches, so MXU utilization tracks offered HTTP
  load exactly as it does for in-process submit() (deploy/server.py);
* the wire format is numpy's own serialization (`.npy` request/response
  bodies, `.npz` for reencode's token+mel pair): exact dtypes, zero schema
  code on either end (`np.save`/`np.load` round-trip), and loading always
  uses allow_pickle=False;
* backpressure surfaces as HTTP status codes: 429 when the ingress queue is
  at max_queue, 413 for clips longer than the largest exported bucket,
  400 for malformed payloads — sustained overload degrades loudly instead
  of growing memory.

Endpoints:
  GET  /healthz   -> JSON {ok, mel_channels, buckets, ops, ...}
  GET  /stats     -> JSON {op: ServerStats.summary()}
  POST /encode    .npy (T, mel) float mel  -> .npy (T,) int32 tokens
  POST /decode    .npy (T,) int tokens     -> .npy (T, mel) float32 mel
  POST /reencode  .npy (T, mel) float mel  -> .npz {tokens, mel}
  Optional request header `X-Clip-Length: n` marks trailing rows/frames of
  the payload as padding (same contract as submit(length=n)).

CLI:  python -m mqgan_tpu.deploy.http_server --model_dir DIR [--port 8765]
      [--ops encode,decode,reencode] [--max_batch 64] [--max_delay_ms 5]
      [--max_queue 1024] [--data_parallel]
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

import numpy as np

from mqgan_tpu.deploy.runtime import ExportedPreEncoder
from mqgan_tpu.deploy.server import CodecServer, ServerOverloadedError

DEFAULT_OPS = ("encode", "decode", "reencode")
# refuse absurd request bodies before np.load sees them (the largest real
# payload is bucket_T x mel float32; 256 MiB covers any exported config)
MAX_BODY_BYTES = 256 << 20


class _HTTPError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _load_npy(body: bytes) -> np.ndarray:
    try:
        return np.load(io.BytesIO(body), allow_pickle=False)
    except Exception as e:  # noqa: BLE001 — surface as a client error
        raise _HTTPError(400, f"body is not a valid .npy payload: {e}")


class CodecHTTPService:
    """Owns the runtime + per-op CodecServers; maps requests to responses.

    Separated from the BaseHTTPRequestHandler so the logic is directly
    unit-testable and reusable behind other transports."""

    def __init__(
        self,
        model_dir: Optional[str] = None,
        runtime: Optional[ExportedPreEncoder] = None,
        *,
        ops: Sequence[str] = DEFAULT_OPS,
        max_batch: int = 64,
        max_delay_ms: float = 5.0,
        max_queue: int = 1024,
    ):
        if runtime is None:
            if model_dir is None:
                raise ValueError("need model_dir or runtime")
            runtime = ExportedPreEncoder(model_dir)
        self.runtime = runtime
        bad = [o for o in ops if o not in DEFAULT_OPS]
        if bad:
            raise ValueError(f"unknown ops {bad}; choose from {DEFAULT_OPS}")
        self.servers = {
            op: CodecServer(runtime=runtime, op=op, max_batch=max_batch,
                            max_delay_ms=max_delay_ms, max_queue=max_queue)
            for op in ops
        }

    # ------------------------------------------------------------------
    def health(self) -> dict:
        rt = self.runtime
        return {
            "ok": True,
            "ops": sorted(self.servers),
            "mel_channels": rt.mel_channels,
            "buckets": rt.buckets,
            "codebook_size": rt.codebook_size,
            "fsq_levels": rt.fsq_levels,
            "n_devices": rt.n_devices,
        }

    def stats(self) -> dict:
        return {op: srv.stats.summary() for op, srv in self.servers.items()}

    def handle(self, op: str, body: bytes, length: Optional[int]) -> bytes:
        """One clip through op; returns the serialized response body.
        Raises _HTTPError with the right status on every failure mode."""
        srv = self.servers.get(op)
        if srv is None:
            raise _HTTPError(404, f"op {op!r} not served (have "
                                  f"{sorted(self.servers)})")
        data = _load_npy(body)
        if op == "decode":
            if data.ndim != 1 or not np.issubdtype(data.dtype, np.integer):
                raise _HTTPError(
                    400, f"decode expects a 1-D integer token array, got "
                         f"shape {data.shape} dtype {data.dtype}")
            data = data.astype(np.int32)
        else:
            if data.ndim != 2 or data.shape[1] != self.runtime.mel_channels:
                raise _HTTPError(
                    400, f"{op} expects a (T, {self.runtime.mel_channels}) "
                         f"mel array, got shape {data.shape}")
            data = data.astype(np.float32)
        if length is not None and not (0 <= length <= data.shape[0]):
            raise _HTTPError(
                400, f"X-Clip-Length {length} outside [0, {data.shape[0]}]")
        try:
            result = srv.submit(data, length).result()
        except ServerOverloadedError as e:
            raise _HTTPError(429, str(e))
        except ValueError as e:  # clip exceeds the largest exported bucket
            raise _HTTPError(413, str(e))
        except RuntimeError as e:  # server closed mid-flight
            raise _HTTPError(503, str(e))
        if op == "reencode":
            tokens, mel = result
            return _npz_bytes(tokens=np.asarray(tokens),
                              mel=np.asarray(mel))
        return _npy_bytes(np.asarray(result))

    def close(self):
        for srv in self.servers.values():
            srv.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class _Handler(BaseHTTPRequestHandler):
    # set per-server via serve(); class attr so the stdlib ctor signature
    # stays untouched
    service: CodecHTTPService = None
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet by default; stats has counts
        pass

    def _reply(self, status: int, body: bytes, content_type: str):
        self.send_response(status)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _reply_json(self, status: int, obj) -> None:
        self._reply(status, json.dumps(obj).encode(), "application/json")

    def do_GET(self):
        if self.path == "/healthz":
            self._reply_json(200, self.service.health())
        elif self.path == "/stats":
            self._reply_json(200, self.service.stats())
        else:
            self._reply_json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        op = self.path.lstrip("/")
        try:
            n = int(self.headers.get("Content-Length", 0))
            if n <= 0:
                raise _HTTPError(400, "missing/empty request body")
            if n > MAX_BODY_BYTES:
                raise _HTTPError(413, f"body {n} bytes exceeds "
                                      f"{MAX_BODY_BYTES}")
            body = self.rfile.read(n)
            length_hdr = self.headers.get("X-Clip-Length")
            try:
                length = int(length_hdr) if length_hdr is not None else None
            except ValueError:
                raise _HTTPError(400,
                                 f"bad X-Clip-Length {length_hdr!r}")
            out = self.service.handle(op, body, length)
        except _HTTPError as e:
            self._reply_json(e.status, {"error": e.message})
            return
        except Exception as e:  # noqa: BLE001 — never kill the conn thread
            self._reply_json(500, {"error": f"{type(e).__name__}: {e}"})
            return
        ctype = ("application/x-npz" if op == "reencode"
                 else "application/x-npy")
        self._reply(200, out, ctype)


class CodecHTTPServer:
    """ThreadingHTTPServer wrapper: each connection gets a handler thread
    that blocks on its clip's future, so concurrency comes for free and the
    micro-batcher sees all in-flight clips at once."""

    def __init__(self, service: CodecHTTPService, host: str = "127.0.0.1",
                 port: int = 0):
        self.service = service
        handler = type("_BoundHandler", (_Handler,), {"service": service})
        # stdlib default listen backlog is 5: a burst of concurrent
        # clients beyond it gets TCP connection-reset before accept()
        # (hit at 32 clients in the round-5 serving bench) — widen it
        ThreadingHTTPServer.request_queue_size = 128
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._httpd.daemon_threads = True
        self._thread = None

    @property
    def address(self) -> tuple:
        return self._httpd.server_address

    @property
    def url(self) -> str:
        host, port = self.address[:2]
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
        description="Serve an exported MQGAN-TPU codec over HTTP.")
    p.add_argument("--model_dir", required=True,
                   help="exported artifact dir (deploy.export)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--ops", default="encode,decode,reencode",
                   help="comma-separated subset of encode,decode,reencode")
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--max_delay_ms", type=float, default=5.0)
    p.add_argument("--max_queue", type=int, default=1024)
    p.add_argument("--data_parallel", action="store_true",
                   help="fan batches out over all local devices")
    args = p.parse_args(argv)

    runtime = ExportedPreEncoder(args.model_dir,
                                 data_parallel=args.data_parallel)
    service = CodecHTTPService(
        runtime=runtime, ops=tuple(args.ops.split(",")),
        max_batch=args.max_batch, max_delay_ms=args.max_delay_ms,
        max_queue=args.max_queue)
    server = CodecHTTPServer(service, host=args.host, port=args.port)
    print(f"serving {sorted(service.servers)} from {args.model_dir} "
          f"on {server.url} ({runtime.n_devices} device(s))")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == "__main__":
    main()
