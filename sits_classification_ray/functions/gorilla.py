"""Gorilla time-series compression: delta-of-delta timestamps + XOR floats.

Implements the encoding of Pelkonen et al., "Gorilla: A Fast, Scalable,
In-Memory Time Series Database" (VLDB 2015) — the codec the north star
prescribes for per-url metric streams. This replaces the reference's
parse-once npy/pkl segment cache (``pytorch/utils/Dataset.py:96-115``)
with a compact binary segment per (url, metric).

Timestamps (int64, microseconds):
  header: raw 64-bit first timestamp; then per point the
  delta-of-delta D (first point uses prev_delta = 0) with prefix codes
    '0'                      D == 0
    '10'   + 7  bits         D ∈ [-63, 64]        (stored D + 63)
    '110'  + 9  bits         D ∈ [-255, 256]      (stored D + 255)
    '1110' + 12 bits         D ∈ [-2047, 2048]    (stored D + 2047)
    '1111' + 64 bits         otherwise (raw two's-complement)
  (the paper's last class is 32-bit; 64 here because microsecond deltas
  overflow 32 bits — same prefix structure.)

Values (float64, bit pattern preserved — NaN survives roundtrip):
  header: raw 64-bit first value; then per point XOR with predecessor:
    '0'                      XOR == 0
    '10' + meaningful bits   fits predecessor's leading/trailing window
    '11' + 5 bits lz + 6 bits (sig-1) + sig bits   new window

Bit-level encode/decode is an inherently sequential loop; it runs
per-series inside ``map_batches`` / ``map_groups`` where series are
short, with numpy precomputing deltas and XORs.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    @classmethod
    def from_bytes(cls, data: bytes, bit_len: int) -> "BitWriter":
        """Resume writing after ``bit_len`` bits of ``data`` — the
        incremental-append entry point (per-partition compression
        state, SURVEY §2.9 / north-star checkpoint cursors)."""
        w = cls()
        full, tail = divmod(bit_len, 8)
        w.buf = bytearray(data[:full])
        if tail:
            w.acc = data[full] >> (8 - tail)
            w.nbits = tail
        return w

    @property
    def bit_len(self) -> int:
        return len(self.buf) * 8 + self.nbits

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def to_bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, nbits: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        while nbits:
            byte_i, bit_i = divmod(pos, 8)
            avail = 8 - bit_i
            take = avail if avail < nbits else nbits
            chunk = (data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            nbits -= take
            pos += take
        self.pos = pos
        return out


_DOD_CLASSES = (          # (lo, hi, prefix, prefix_bits, payload_bits)
    (-63, 64, 0b10, 2, 7),
    (-255, 256, 0b110, 3, 9),
    (-2047, 2048, 0b1110, 4, 12),
)


def _write_dods(w: BitWriter, ts: np.ndarray, last_ts: int,
                last_delta: int) -> tuple[int, int]:
    """Append delta-of-delta codes for ``ts`` continuing from
    (last_ts, last_delta); returns the new (last_ts, last_delta)."""
    prev = np.concatenate(([last_ts], ts[:-1]))
    deltas = ts - prev
    dods = np.diff(np.concatenate(([last_delta], deltas)))
    for d in dods.tolist():
        if d == 0:
            w.write(0, 1)
            continue
        for lo, hi, prefix, pbits, vbits in _DOD_CLASSES:
            if lo <= d <= hi:
                w.write(prefix, pbits)
                w.write(d - lo, vbits)
                break
        else:
            w.write(0b1111, 4)
            w.write(d & ((1 << 64) - 1), 64)
    return int(ts[-1]), int(deltas[-1])


def encode_timestamps(ts: np.ndarray) -> bytes:
    """int64 microsecond timestamps (sorted) → delta-of-delta bytes."""
    ts = np.asarray(ts, dtype=np.int64)
    w = BitWriter()
    if len(ts) == 0:
        return w.to_bytes()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if len(ts) > 1:
        _write_dods(w, ts[1:], int(ts[0]), 0)
    return w.to_bytes()


def decode_timestamps(data: bytes, n: int) -> np.ndarray:
    """Inlined hot loop (VERDICT r3 #6): instead of a ``BitReader``
    method call (+ per-byte divmod) per field, the decoder keeps the
    unread bits in a local int accumulator refilled 8 bytes at a time
    via ``int.from_bytes`` and extracts each field with one
    shift+mask. Bit-exact with the reference ``BitReader`` path (the
    roundtrip/goldens pin it); ~2-3× faster, which is the read-side
    throughput of the segment cache."""
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    acc = 0          # low `bits` bits are the unread stream prefix
    bits = 0
    bpos = 0
    nbytes = len(data)
    # refill enough for the 64-bit header + first point
    while bits < 80 and bpos + 8 <= nbytes:
        acc = (acc << 64) | int.from_bytes(data[bpos:bpos + 8], "big")
        bpos += 8
        bits += 64
    while bits < 80 and bpos < nbytes:
        acc = (acc << 8) | data[bpos]
        bpos += 1
        bits += 8
    t = (acc >> (bits - 64)) & 0xFFFFFFFFFFFFFFFF
    bits -= 64
    acc &= (1 << bits) - 1
    if t >= 1 << 63:
        t -= 1 << 64
    out[0] = t
    delta = 0
    for i in range(1, n):
        # worst case per point: 4 prefix + 64 payload = 68 bits
        if bits < 68:
            while bits < 68 and bpos + 8 <= nbytes:
                acc = (acc << 64) | int.from_bytes(data[bpos:bpos + 8],
                                                   "big")
                bpos += 8
                bits += 64
            while bits < 68 and bpos < nbytes:
                acc = (acc << 8) | data[bpos]
                bpos += 1
                bits += 8
        if (acc >> (bits - 1)) & 1 == 0:
            bits -= 1
            d = 0
        elif (acc >> (bits - 2)) & 1 == 0:          # '10' + 7
            d = ((acc >> (bits - 9)) & 0x7F) - 63
            bits -= 9
        elif (acc >> (bits - 3)) & 1 == 0:          # '110' + 9
            d = ((acc >> (bits - 12)) & 0x1FF) - 255
            bits -= 12
        elif (acc >> (bits - 4)) & 1 == 0:          # '1110' + 12
            d = ((acc >> (bits - 16)) & 0xFFF) - 2047
            bits -= 16
        else:                                       # '1111' + 64 raw
            d = (acc >> (bits - 68)) & 0xFFFFFFFFFFFFFFFF
            bits -= 68
            if d >= 1 << 63:
                d -= 1 << 64
        acc &= (1 << bits) - 1
        delta += d
        t += delta
        out[i] = t
    return out


def _write_xors(w: BitWriter, bits: np.ndarray, prev: int, lz_win: int,
                sig_win: int) -> tuple[int, int, int]:
    """Append XOR codes for ``bits`` continuing from (prev, window);
    returns the new (prev, lz_win, sig_win)."""
    prevs = np.concatenate(([np.uint64(prev)], bits[:-1]))
    xors = (bits ^ prevs).tolist()
    for x in xors:
        if x == 0:
            w.write(0, 1)
            continue
        lz = 64 - x.bit_length()
        if lz > 31:
            lz = 31                     # 5-bit field cap (paper)
        tz = (x & -x).bit_length() - 1
        sig = 64 - lz - tz
        if lz_win >= 0 and lz >= lz_win and tz >= 64 - lz_win - sig_win:
            w.write(0b10, 2)
            w.write(x >> (64 - lz_win - sig_win), sig_win)
        else:
            lz_win, sig_win = lz, sig
            w.write(0b11, 2)
            w.write(lz, 5)
            w.write(sig - 1, 6)
            w.write(x >> tz, sig)
    return int(bits[-1]), lz_win, sig_win


def encode_values(values: np.ndarray) -> bytes:
    """float64 array → Gorilla XOR bytes (bit patterns preserved)."""
    bits = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    w = BitWriter()
    if len(bits) == 0:
        return w.to_bytes()
    prev = int(bits[0])
    w.write(prev, 64)
    if len(bits) > 1:
        _write_xors(w, bits[1:], prev, -1, -1)
    return w.to_bytes()


def decode_values(data: bytes, n: int) -> np.ndarray:
    """Same inlined-accumulator optimization as
    :func:`decode_timestamps` — see the note there."""
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    acc = 0
    bits = 0
    bpos = 0
    nbytes = len(data)
    while bits < 80 and bpos + 8 <= nbytes:
        acc = (acc << 64) | int.from_bytes(data[bpos:bpos + 8], "big")
        bpos += 8
        bits += 64
    while bits < 80 and bpos < nbytes:
        acc = (acc << 8) | data[bpos]
        bpos += 1
        bits += 8
    prev = (acc >> (bits - 64)) & 0xFFFFFFFFFFFFFFFF
    bits -= 64
    acc &= (1 << bits) - 1
    out[0] = prev
    shift = 0            # 64 - lz_win - sig_win for the current window
    sig_win = -1
    for i in range(1, n):
        # worst case per point: 2 + 5 + 6 + 64 = 77 bits
        if bits < 77:
            while bits < 77 and bpos + 8 <= nbytes:
                acc = (acc << 64) | int.from_bytes(data[bpos:bpos + 8],
                                                   "big")
                bpos += 8
                bits += 64
            while bits < 77 and bpos < nbytes:
                acc = (acc << 8) | data[bpos]
                bpos += 1
                bits += 8
        if (acc >> (bits - 1)) & 1 == 0:
            bits -= 1
            acc &= (1 << bits) - 1
            out[i] = prev
            continue
        if (acc >> (bits - 2)) & 1 == 0:            # '10' — reuse window
            x = ((acc >> (bits - 2 - sig_win))
                 & ((1 << sig_win) - 1)) << shift
            bits -= 2 + sig_win
        else:                                       # '11' — new window
            lz_win = (acc >> (bits - 7)) & 0x1F
            sig_win = ((acc >> (bits - 13)) & 0x3F) + 1
            shift = 64 - lz_win - sig_win
            x = ((acc >> (bits - 13 - sig_win))
                 & ((1 << sig_win) - 1)) << shift
            bits -= 13 + sig_win
        acc &= (1 << bits) - 1
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


def encode_series(ts_us: np.ndarray, values: np.ndarray) -> tuple[bytes, bytes]:
    """One sorted series → (ts_codes, val_codes)."""
    return encode_timestamps(ts_us), encode_values(values)


# ---------------------------------------------------------------------------
# Incremental append — the per-partition compression state / checkpoint
# cursor that lets an ingest actor extend stored segments without
# decode+re-encode (north-star "actor pools holding per-partition
# compression state and checkpoint cursors").
# ---------------------------------------------------------------------------


def encode_series_state(ts_us: np.ndarray, values: np.ndarray
                        ) -> tuple[bytes, bytes, dict]:
    """Encode and also return the resumable cursor state."""
    ts = np.asarray(ts_us, dtype=np.int64)
    bits = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    wt, wv = BitWriter(), BitWriter()
    if len(ts) == 0:
        return wt.to_bytes(), wv.to_bytes(), {
            "n": 0, "last_ts": 0, "last_delta": 0, "ts_bits": 0,
            "prev_val": 0, "lz_win": -1, "sig_win": -1, "val_bits": 0}
    wt.write(int(ts[0]) & ((1 << 64) - 1), 64)
    last_ts, last_delta = int(ts[0]), 0
    if len(ts) > 1:
        last_ts, last_delta = _write_dods(wt, ts[1:], last_ts, 0)
    prev = int(bits[0])
    wv.write(prev, 64)
    lz_win = sig_win = -1
    if len(bits) > 1:
        prev, lz_win, sig_win = _write_xors(wv, bits[1:], prev, -1, -1)
    state = {"n": len(ts), "last_ts": last_ts, "last_delta": last_delta,
             "ts_bits": wt.bit_len, "prev_val": prev,
             "lz_win": lz_win, "sig_win": sig_win, "val_bits": wv.bit_len}
    return wt.to_bytes(), wv.to_bytes(), state


def append_series(ts_codes: bytes, val_codes: bytes, state: dict,
                  new_ts: np.ndarray, new_values: np.ndarray
                  ) -> tuple[bytes, bytes, dict]:
    """Extend an encoded segment with new (later) points in place.

    ``new_ts`` must be strictly after ``state['last_ts']`` (late rows
    invalidate the partition and trigger recompute instead — SURVEY
    §2.9). No decode happens; the cursor resumes mid-byte.
    """
    ts = np.asarray(new_ts, dtype=np.int64)
    if len(ts) == 0:
        return ts_codes, val_codes, state
    if state["n"] == 0:
        return encode_series_state(ts, new_values)
    if int(ts[0]) <= state["last_ts"]:
        raise ValueError("append_series requires strictly later timestamps; "
                         "late data must recompute the partition")
    bits = np.ascontiguousarray(new_values, dtype=np.float64).view(np.uint64)
    wt = BitWriter.from_bytes(ts_codes, state["ts_bits"])
    last_ts, last_delta = _write_dods(wt, ts, state["last_ts"],
                                      state["last_delta"])
    wv = BitWriter.from_bytes(val_codes, state["val_bits"])
    prev, lz_win, sig_win = _write_xors(wv, bits, state["prev_val"],
                                        state["lz_win"], state["sig_win"])
    new_state = {"n": state["n"] + len(ts), "last_ts": last_ts,
                 "last_delta": last_delta, "ts_bits": wt.bit_len,
                 "prev_val": prev, "lz_win": lz_win, "sig_win": sig_win,
                 "val_bits": wv.bit_len}
    return wt.to_bytes(), wv.to_bytes(), new_state


def decode_series(ts_codes: bytes, val_codes: bytes, n: int) -> tuple[np.ndarray, np.ndarray]:
    return decode_timestamps(ts_codes, n), decode_values(val_codes, n)
