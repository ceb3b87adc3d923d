"""Streaming token -> mel decode with exact parity to offline decode.

Net-new over the reference (which has no streaming path at all; its
TorchScript deployment decodes whole clips, preencoder.py:453-504): tokens
arrive in chunks and refined mel frames are emitted incrementally with a
FIXED algorithmic latency, while every emitted frame is numerically
identical to what the offline (whole-clip) decode produces.

How: the whole decode side is time-local (causal trunk — CBAM dropped —
plus the 5x5 post mel-mixer and the UNet refiner; see core/chunking.py),
with left/right receptive halos (halo_l, halo_r) = decoder_halos(). The
streamer keeps a ring of recent tokens; once a frame has halo_r tokens of
future context buffered it can be emitted, decoded inside a fixed
``window`` whose left edge carries halo_l tokens of past context. Output
latency is therefore halo_r frames (+ the caller's chunk cadence);
flush() emits the tail exactly, because a real clip end is a clip end in
both the streamed and offline passes.

Exactness is guaranteed under the padded-decode convention (windows are
right-padded to the compiled bucket with a pad mask — the same convention
offline chunked eval and the exported runtime use) and is pinned by
tests/test_streaming.py at ~1e-5 fp32, including chunk-size invariance.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from mqgan_tpu.core.chunking import decoder_halos


class StreamingDecoder:
    """Incremental token -> refined-mel decoder.

    Parameters
    ----------
    decode_fn: (indices (1, W) int32, pad_mask (1, W) bool) -> (1, W, mel)
        A whole-window decode. W may be any length <= ``window`` (the fn
        is called with exactly ``window`` columns every time, so a jitted
        or exported bucket executable compiles once).
    halo_l, halo_r: decode-side receptive halos (core/chunking.decoder_halos).
    window: compiled window length; must fit halo_l + halo_r + align.
    align: window starts stay multiples of this (refiner pooling grid,
        2**refiner_depth — core/chunking.halo_align).
    mel_channels: output channel count; when given, warm-up feeds return
        correctly-shaped (0, mel_channels) arrays (otherwise (0,) until the
        first emission reveals the shape).
    """

    def __init__(
        self,
        decode_fn: Callable,
        halo_l: int,
        halo_r: int,
        window: int,
        align: int = 8,
        mel_channels: Optional[int] = None,
    ):
        stride = window - halo_l - halo_r
        if stride < align:
            raise ValueError(
                f"window {window} too small for halos {halo_l}+{halo_r}")
        self.decode_fn = decode_fn
        self.halo_l = int(halo_l)
        self.halo_r = int(halo_r)
        self.window = int(window)
        self.align = int(align)
        if mel_channels is not None:
            self._tail = (int(mel_channels),)
        self.reset()

    # ------------------------------------------------------------------
    @classmethod
    def from_runtime(cls, runtime, window: Optional[int] = None,
                     align: Optional[int] = None):
        """Wrap an ExportedPreEncoder: uses its largest exported bucket,
        the decode-side manifest halos, and the manifest pooling-grid
        alignment (all with flagship fallbacks inside the runtime
        properties for pre-halo-field manifests)."""
        window = int(window or runtime.buckets[-1])

        def decode_fn(idx, mask):
            lengths = (~mask).sum(axis=1).astype(np.int32)
            # runtime.decode pads/trims to its own buckets; feed exactly
            # one bucket-sized window so no re-bucketing happens
            return runtime.decode(idx, lengths)

        halo_l, halo_r = runtime.decoder_halos
        return cls(decode_fn, halo_l, halo_r, window,
                   align=int(align or runtime.halo_align),
                   mel_channels=runtime.mel_channels)

    # ------------------------------------------------------------------
    def reset(self) -> None:
        self._tokens: List[np.ndarray] = []
        self._n = 0  # total tokens received
        self._emitted = 0  # frames already returned
        self._drop = 0  # tokens discarded from the left of the buffer
        self._closed = False

    @property
    def latency_frames(self) -> int:
        """Algorithmic output latency: a frame is emitted once halo_r
        tokens of future context have arrived."""
        return self.halo_r

    # ------------------------------------------------------------------
    def _buffer(self) -> np.ndarray:
        if len(self._tokens) > 1:
            self._tokens = [np.concatenate(self._tokens)]
        return self._tokens[0] if self._tokens else np.zeros(0, np.int32)

    def _decode_span(self, ws: int, we: int) -> np.ndarray:
        """Decode global token span [ws, we) through the fixed window."""
        buf = self._buffer()
        seg = buf[ws - self._drop: we - self._drop]
        idx = np.zeros((1, self.window), np.int32)
        idx[0, : len(seg)] = seg
        mask = np.arange(self.window)[None, :] >= len(seg)
        out = np.asarray(self.decode_fn(idx, mask))
        return out[0, : len(seg)]

    def _emit_until(self, hi: int) -> np.ndarray:
        """Emit frames [self._emitted, hi), hi already context-safe."""
        outs = []
        while self._emitted < hi:
            ws = max(0, self._emitted - self.halo_l)
            ws -= ws % self.align
            we = min(self._n, ws + self.window)
            lo, up = self._emitted, min(hi, we - (0 if we == self._n and
                                                  self._closed else self.halo_r))
            if up <= lo:
                break
            frames = self._decode_span(ws, we)
            outs.append(frames[lo - ws: up - ws])
            self._emitted = up
        # drop tokens no longer reachable by any future window's left edge
        keep_from = max(0, self._emitted - self.halo_l - self.align)
        if keep_from > self._drop and self._tokens:
            buf = self._buffer()
            self._tokens = [buf[keep_from - self._drop:]]
            self._drop = keep_from
        if not outs:
            return np.zeros((0,) + self._out_shape_tail(), np.float32)
        return np.concatenate(outs, axis=0)

    _tail = None

    def _out_shape_tail(self):
        return self._tail or ()

    # ------------------------------------------------------------------
    def feed(self, indices: np.ndarray) -> np.ndarray:
        """Append a chunk of token indices (T_chunk,) and return every mel
        frame (N, mel) that now has full future context. N may be 0 while
        the stream warms up."""
        if self._closed:
            raise RuntimeError("stream is closed; call reset()")
        indices = np.asarray(indices, np.int32).reshape(-1)
        if indices.size:
            self._tokens.append(indices)
            self._n += indices.size
        out = self._emit_until(max(self._emitted, self._n - self.halo_r))
        if out.size and self._tail is None:
            self._tail = out.shape[1:]
        return out

    def flush(self) -> np.ndarray:
        """End of stream: emit the remaining halo_r-latency tail. The clip
        end is a real clip end, so these frames also match offline."""
        self._closed = True
        return self._emit_until(self._n)
