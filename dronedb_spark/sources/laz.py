"""Pure-Python LAZ (LASzip) codec — POINT10 v2 + GPSTIME11 v2.

Implements the public LASzip format ("LASzip: lossless compression of
LiDAR data", Isenburg; format spec published with the LAZ specification):
an adaptive arithmetic coder (the Said FastAC scheme the spec mandates),
the k-bit IntegerCompressor, streaming-median delta prediction for x/y,
per-return-level z prediction, and the chunked stream layout (chunk table
+ per-chunk raw seed point).  Both a compressor and a decompressor are
provided so the codec round-trips without external tooling (laszip /
laspy are not available in this environment).

Reference role-equivalence: the reference ingests .laz via PDAL/untwine
(src/library/pointcloud.cpp); here the decode is a pure-Python kernel
invoked per file inside Arrow ``mapInPandas`` (sources/bridge.py), so a
1000-executor cluster decodes one .laz per task with no shuffle before
the decode — the file is the natural parallel unit.

Scope: point formats 0-3 (POINT10, +GPSTIME11, +RGB12), LAS 1.2
headers, fixed-size chunking (default 50000).  These cover the dominant
real-world survey exports; other item types raise ``NotImplementedError``.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ coder
# Adaptive arithmetic coder per the LASzip spec (Said's FastAC scheme).

_AC_MAX_LENGTH = 0xFFFFFFFF
_AC_MIN_LENGTH = 0x01000000
_DM_LENGTH_SHIFT = 15
_DM_MAX_COUNT = 1 << _DM_LENGTH_SHIFT
_BM_LENGTH_SHIFT = 13
_BM_MAX_COUNT = 1 << _BM_LENGTH_SHIFT


class ArithmeticBitModel:
    __slots__ = ("bit_0_count", "bit_count", "bit_0_prob", "update_cycle", "bits_until_update")

    def __init__(self) -> None:
        self.init()

    def init(self) -> None:
        self.bit_0_count = 1
        self.bit_count = 2
        self.bit_0_prob = 1 << (_BM_LENGTH_SHIFT - 1)
        self.update_cycle = self.bits_until_update = 4

    def update(self) -> None:
        self.bit_count += self.update_cycle
        if self.bit_count > _BM_MAX_COUNT:
            self.bit_count = (self.bit_count + 1) >> 1
            self.bit_0_count = (self.bit_0_count + 1) >> 1
            if self.bit_0_count == self.bit_count:
                self.bit_count += 1
        scale = 0x80000000 // self.bit_count
        self.bit_0_prob = (self.bit_0_count * scale) >> (31 - _BM_LENGTH_SHIFT)
        self.update_cycle = min((5 * self.update_cycle) >> 2, 64)
        self.bits_until_update = self.update_cycle


class ArithmeticModel:
    __slots__ = (
        "symbols", "distribution", "symbol_count", "total_count",
        "update_cycle", "symbols_until_update", "last_symbol",
    )

    def __init__(self, symbols: int) -> None:
        self.symbols = symbols
        self.init()

    def init(self) -> None:
        n = self.symbols
        self.last_symbol = n - 1
        self.symbol_count = [1] * n
        self.total_count = 0
        self.update_cycle = n
        self.distribution = [0] * n
        self.update()
        self.symbols_until_update = self.update_cycle = (n + 6) >> 1

    def update(self) -> None:
        self.total_count += self.update_cycle
        if self.total_count > _DM_MAX_COUNT:
            self.total_count = 0
            for k in range(self.symbols):
                self.symbol_count[k] = (self.symbol_count[k] + 1) >> 1
                self.total_count += self.symbol_count[k]
        scale = 0x80000000 // self.total_count
        csum = 0
        dist = self.distribution
        cnt = self.symbol_count
        for k in range(self.symbols):
            dist[k] = (scale * csum) >> (31 - _DM_LENGTH_SHIFT)
            csum += cnt[k]
        self.update_cycle = min((5 * self.update_cycle) >> 2, (self.symbols + 6) << 3)
        self.symbols_until_update = self.update_cycle


class ArithmeticEncoder:
    def __init__(self) -> None:
        self.out = bytearray()
        self.base = 0
        self.length = _AC_MAX_LENGTH

    def _propagate_carry(self) -> None:
        i = len(self.out) - 1
        while self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def _renorm(self) -> None:
        while self.length < _AC_MIN_LENGTH:
            self.out.append((self.base >> 24) & 0xFF)
            self.base = (self.base << 8) & 0xFFFFFFFF
            self.length = (self.length << 8) & 0xFFFFFFFF

    def encode_bit(self, m: ArithmeticBitModel, bit: int) -> None:
        x = m.bit_0_prob * (self.length >> _BM_LENGTH_SHIFT)
        if bit == 0:
            self.length = x
            m.bit_0_count += 1
        else:
            init_base = self.base
            self.base = (self.base + x) & 0xFFFFFFFF
            self.length -= x
            if init_base > self.base:
                self._propagate_carry()
        if self.length < _AC_MIN_LENGTH:
            self._renorm()
        m.bits_until_update -= 1
        if m.bits_until_update == 0:
            m.update()

    def encode_symbol(self, m: ArithmeticModel, sym: int) -> None:
        init_base = self.base
        if sym == m.last_symbol:
            x = m.distribution[sym] * (self.length >> _DM_LENGTH_SHIFT)
            self.base = (self.base + x) & 0xFFFFFFFF
            self.length -= x
        else:
            self.length >>= _DM_LENGTH_SHIFT
            x = m.distribution[sym] * self.length
            self.base = (self.base + x) & 0xFFFFFFFF
            self.length = m.distribution[sym + 1] * self.length - x
        if init_base > self.base:
            self._propagate_carry()
        if self.length < _AC_MIN_LENGTH:
            self._renorm()
        m.symbol_count[sym] += 1
        m.symbols_until_update -= 1
        if m.symbols_until_update == 0:
            m.update()

    def write_bits(self, bits: int, sym: int) -> None:
        if bits > 19:
            self.write_short(sym & 0xFFFF)
            self.write_bits(bits - 16, sym >> 16)
            return
        init_base = self.base
        self.length >>= bits
        self.base = (self.base + sym * self.length) & 0xFFFFFFFF
        if init_base > self.base:
            self._propagate_carry()
        if self.length < _AC_MIN_LENGTH:
            self._renorm()

    def write_short(self, sym: int) -> None:
        init_base = self.base
        self.length >>= 16
        self.base = (self.base + sym * self.length) & 0xFFFFFFFF
        if init_base > self.base:
            self._propagate_carry()
        if self.length < _AC_MIN_LENGTH:
            self._renorm()

    def write_int(self, sym: int) -> None:
        self.write_short(sym & 0xFFFF)
        self.write_short((sym >> 16) & 0xFFFF)

    def done(self) -> bytes:
        init_base = self.base
        if self.length > 2 * _AC_MIN_LENGTH:
            self.base = (self.base + _AC_MIN_LENGTH) & 0xFFFFFFFF
            self.length = _AC_MIN_LENGTH >> 1
        else:
            self.base = (self.base + (_AC_MIN_LENGTH >> 1)) & 0xFFFFFFFF
            self.length = _AC_MIN_LENGTH >> 9
        if init_base > self.base:
            self._propagate_carry()
        self._renorm()
        return bytes(self.out)


class ArithmeticDecoder:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.value = 0
        for _ in range(4):
            self.value = (self.value << 8) | self._inbyte()
        self.length = _AC_MAX_LENGTH

    def _inbyte(self) -> int:
        # past-end reads return 0: the encoder's done() may legitimately
        # write fewer flush bytes than the decoder's 4-byte lookahead
        if self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            return b
        return 0

    def _renorm(self) -> None:
        while self.length < _AC_MIN_LENGTH:
            self.value = ((self.value << 8) | self._inbyte()) & 0xFFFFFFFF
            self.length = (self.length << 8) & 0xFFFFFFFF

    def decode_bit(self, m: ArithmeticBitModel) -> int:
        x = m.bit_0_prob * (self.length >> _BM_LENGTH_SHIFT)
        if self.value < x:
            sym = 0
            self.length = x
            m.bit_0_count += 1
        else:
            sym = 1
            self.value -= x
            self.length -= x
        if self.length < _AC_MIN_LENGTH:
            self._renorm()
        m.bits_until_update -= 1
        if m.bits_until_update == 0:
            m.update()
        return sym

    def decode_symbol(self, m: ArithmeticModel) -> int:
        y = self.length
        # bisection search over the cumulative distribution (identical
        # results to the spec's accelerated decoder-table path)
        x = sym = 0
        self.length >>= _DM_LENGTH_SHIFT
        n = m.symbols
        k = n >> 1
        dist = m.distribution
        while True:
            z = self.length * dist[k]
            if z > self.value:
                n = k
                y = z
            else:
                sym = k
                x = z
            k = (sym + n) >> 1
            if k == sym:
                break
        self.value -= x
        self.length = y - x
        if self.length < _AC_MIN_LENGTH:
            self._renorm()
        m.symbol_count[sym] += 1
        m.symbols_until_update -= 1
        if m.symbols_until_update == 0:
            m.update()
        return sym

    def read_bits(self, bits: int) -> int:
        if bits > 19:
            lo = self.read_short()
            hi = self.read_bits(bits - 16)
            return (hi << 16) | lo
        self.length >>= bits
        sym = self.value // self.length
        self.value -= self.length * sym
        if self.length < _AC_MIN_LENGTH:
            self._renorm()
        return sym

    def read_short(self) -> int:
        self.length >>= 16
        sym = self.value // self.length
        self.value -= self.length * sym
        if self.length < _AC_MIN_LENGTH:
            self._renorm()
        return sym

    def read_int(self) -> int:
        lo = self.read_short()
        hi = self.read_short()
        return (hi << 16) | lo


def _i32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - 0x100000000 if v >= 0x80000000 else v


# ------------------------------------------------- integer (de)compressor


class IntegerCompressor:
    """k-bit corrector coding: a 33-symbol model picks the interval
    [-(2^k - 1), 2^k] containing the prediction error, then the error's
    position inside the interval is coded with a per-k model (low bits
    raw above ``bits_high``)."""

    def __init__(self, bits: int = 16, contexts: int = 1, bits_high: int = 8) -> None:
        self.bits = bits
        self.contexts = contexts
        self.bits_high = bits_high
        if bits and bits < 32:
            self.corr_bits = bits
            self.corr_range = 1 << bits
            self.corr_min = -(self.corr_range >> 1)
            self.corr_max = self.corr_min + self.corr_range - 1
        else:
            self.corr_bits = 32
            self.corr_range = 0
            self.corr_min = -0x80000000
            self.corr_max = 0x7FFFFFFF
        self.k = 0
        self.m_bits = [ArithmeticModel(self.corr_bits + 1) for _ in range(contexts)]
        self.m_corr0 = ArithmeticBitModel()
        self.m_corr = [None] + [
            ArithmeticModel(1 << min(k, bits_high)) for k in range(1, self.corr_bits + 1)
        ]

    # -- compress ------------------------------------------------------
    def compress(self, enc: ArithmeticEncoder, pred: int, real: int, context: int = 0) -> None:
        corr = _i32(real - pred)
        if self.corr_range:
            if corr < self.corr_min:
                corr += self.corr_range
            elif corr > self.corr_max:
                corr -= self.corr_range
        self._write_corrector(enc, corr, self.m_bits[context])

    def _write_corrector(self, enc: ArithmeticEncoder, c: int, m_bits: ArithmeticModel) -> None:
        k = 0
        c1 = -c if c <= 0 else c - 1
        while c1:
            c1 >>= 1
            k += 1
        self.k = k
        enc.encode_symbol(m_bits, k)
        if k:
            if k < 32:
                if c >= 0:
                    c -= 1
                else:
                    c += (1 << k) - 1
                if k <= self.bits_high:
                    enc.encode_symbol(self.m_corr[k], c)
                else:
                    k1 = k - self.bits_high
                    enc.encode_symbol(self.m_corr[k], c >> k1)
                    enc.write_bits(k1, c & ((1 << k1) - 1))
        else:
            enc.encode_bit(self.m_corr0, c)

    # -- decompress ----------------------------------------------------
    def decompress(self, dec: ArithmeticDecoder, pred: int, context: int = 0) -> int:
        k = dec.decode_symbol(self.m_bits[context])
        self.k = k
        real = pred + self._read_corrector(dec, k)
        if self.corr_range:
            if real < 0:
                real += self.corr_range
            elif real >= self.corr_range:
                real -= self.corr_range
            return real
        return _i32(real)

    def _read_corrector(self, dec: ArithmeticDecoder, k: int) -> int:
        if k == 0:
            return dec.decode_bit(self.m_corr0)
        if k >= 32:
            return self.corr_min
        if k <= self.bits_high:
            c = dec.decode_symbol(self.m_corr[k])
        else:
            k1 = k - self.bits_high
            c = (dec.decode_symbol(self.m_corr[k]) << k1) | dec.read_bits(k1)
        if c >= (1 << (k - 1)):
            return c + 1
        return c - ((1 << k) - 1)


# --------------------------------------------------------- POINT10 layer

# Public LASzip v2 context tables: map (number_of_returns, return_number)
# to a prediction context / elevation level.
_NUMBER_RETURN_MAP = (
    (15, 14, 13, 12, 11, 10, 9, 8),
    (14, 0, 1, 3, 6, 10, 10, 9),
    (13, 1, 2, 4, 7, 11, 11, 10),
    (12, 3, 4, 5, 8, 12, 12, 11),
    (11, 6, 7, 8, 9, 13, 13, 12),
    (10, 10, 11, 12, 13, 14, 14, 13),
    (9, 10, 11, 12, 13, 14, 15, 14),
    (8, 9, 10, 11, 12, 13, 14, 15),
)
_NUMBER_RETURN_LEVEL = (
    (0, 1, 2, 3, 4, 5, 6, 7),
    (1, 0, 1, 2, 3, 4, 5, 6),
    (2, 1, 0, 1, 2, 3, 4, 5),
    (3, 2, 1, 0, 1, 2, 3, 4),
    (4, 3, 2, 1, 0, 1, 2, 3),
    (5, 4, 3, 2, 1, 0, 1, 2),
    (6, 5, 4, 3, 2, 1, 0, 1),
    (7, 6, 5, 4, 3, 2, 1, 0),
)


class StreamingMedian5:
    __slots__ = ("v", "high")

    def __init__(self) -> None:
        self.v = [0, 0, 0, 0, 0]
        self.high = True

    def add(self, x: int) -> None:
        v = self.v
        if self.high:
            if x < v[2]:
                v[4] = v[3]
                v[3] = v[2]
                if x < v[0]:
                    v[2] = v[1]
                    v[1] = v[0]
                    v[0] = x
                elif x < v[1]:
                    v[2] = v[1]
                    v[1] = x
                else:
                    v[2] = x
            else:
                if x < v[3]:
                    v[4] = v[3]
                    v[3] = x
                else:
                    v[4] = x
                self.high = False
        else:
            if v[2] < x:
                v[0] = v[1]
                v[1] = v[2]
                if v[4] < x:
                    v[2] = v[3]
                    v[3] = v[4]
                    v[4] = x
                elif v[3] < x:
                    v[2] = v[3]
                    v[3] = x
                else:
                    v[2] = x
            else:
                if v[1] < x:
                    v[0] = v[1]
                    v[1] = x
                else:
                    v[0] = x
                self.high = True

    def get(self) -> int:
        return self.v[2]


# A POINT10 record in codec form: [x, y, z, intensity, flags,
# classification, scan_angle(u8-folded), user_data, point_source].
_P10 = struct.Struct("<iiiHBBBBH")


class Point10V2:
    """Shared state machine for the POINT10 v2 item (encode + decode)."""

    def __init__(self) -> None:
        self.m_changed = ArithmeticModel(64)
        self.m_scan_angle = [ArithmeticModel(256), ArithmeticModel(256)]
        self.m_bit_byte: list = [None] * 256
        self.m_classification: list = [None] * 256
        self.m_user_data: list = [None] * 256
        self.ic_intensity = IntegerCompressor(16, 4)
        self.ic_point_source = IntegerCompressor(16, 1)
        self.ic_dx = IntegerCompressor(32, 2)
        self.ic_dy = IntegerCompressor(32, 22)
        self.ic_z = IntegerCompressor(32, 20)

    def init(self, first: list) -> None:
        self.med_x = [StreamingMedian5() for _ in range(16)]
        self.med_y = [StreamingMedian5() for _ in range(16)]
        self.last_intensity = [0] * 16
        self.last_height = [0] * 8
        for m in (self.m_changed, *self.m_scan_angle):
            m.init()
        for lazy in (self.m_bit_byte, self.m_classification, self.m_user_data):
            for m in lazy:
                if m is not None:
                    m.init()
        self.ic_intensity = IntegerCompressor(16, 4)
        self.ic_point_source = IntegerCompressor(16, 1)
        self.ic_dx = IntegerCompressor(32, 2)
        self.ic_dy = IntegerCompressor(32, 22)
        self.ic_z = IntegerCompressor(32, 20)
        self.last = list(first)
        self.last[3] = 0  # v2 quirk: the seed point's intensity predicts as 0

    @staticmethod
    def _lazy(models: list, i: int) -> ArithmeticModel:
        if models[i] is None:
            models[i] = ArithmeticModel(256)
        return models[i]

    def write(self, enc: ArithmeticEncoder, cur: list) -> None:
        last = self.last
        r = cur[4] & 0x07
        n = (cur[4] >> 3) & 0x07
        m = _NUMBER_RETURN_MAP[n][r]
        lev = _NUMBER_RETURN_LEVEL[n][r]
        changed = (
            ((last[4] != cur[4]) << 5)
            | ((self.last_intensity[m] != cur[3]) << 4)
            | ((last[5] != cur[5]) << 3)
            | ((last[6] != cur[6]) << 2)
            | ((last[7] != cur[7]) << 1)
            | (last[8] != cur[8])
        )
        enc.encode_symbol(self.m_changed, changed)
        if changed:
            if changed & 32:
                enc.encode_symbol(self._lazy(self.m_bit_byte, last[4]), cur[4])
            if changed & 16:
                self.ic_intensity.compress(
                    enc, self.last_intensity[m], cur[3], m if m < 3 else 3
                )
                self.last_intensity[m] = cur[3]
            if changed & 8:
                enc.encode_symbol(self._lazy(self.m_classification, last[5]), cur[5])
            if changed & 4:
                enc.encode_symbol(
                    self.m_scan_angle[(cur[4] >> 6) & 1], (cur[6] - last[6]) & 0xFF
                )
            if changed & 2:
                enc.encode_symbol(self._lazy(self.m_user_data, last[7]), cur[7])
            if changed & 1:
                self.ic_point_source.compress(enc, last[8], cur[8])
        # x, then y (context from x's k), then z (context from x+y k)
        diff = _i32(cur[0] - last[0])
        self.ic_dx.compress(enc, self.med_x[m].get(), diff, 1 if n == 1 else 0)
        self.med_x[m].add(diff)
        kb = self.ic_dx.k
        diff = _i32(cur[1] - last[1])
        ctx = (1 if n == 1 else 0) + ((kb & ~1) if kb < 20 else 20)
        self.ic_dy.compress(enc, self.med_y[m].get(), diff, ctx)
        self.med_y[m].add(diff)
        kb = (self.ic_dx.k + self.ic_dy.k) // 2
        ctx = (1 if n == 1 else 0) + ((kb & ~1) if kb < 18 else 18)
        self.ic_z.compress(enc, self.last_height[lev], cur[2], ctx)
        self.last_height[lev] = cur[2]
        self.last = list(cur)

    def read(self, dec: ArithmeticDecoder) -> list:
        last = self.last
        changed = dec.decode_symbol(self.m_changed)
        if changed:
            if changed & 32:
                last[4] = dec.decode_symbol(self._lazy(self.m_bit_byte, last[4]))
        r = last[4] & 0x07
        n = (last[4] >> 3) & 0x07
        m = _NUMBER_RETURN_MAP[n][r]
        lev = _NUMBER_RETURN_LEVEL[n][r]
        if changed:
            if changed & 16:
                last[3] = self.ic_intensity.decompress(
                    dec, self.last_intensity[m], m if m < 3 else 3
                )
                self.last_intensity[m] = last[3]
            else:
                last[3] = self.last_intensity[m]
            if changed & 8:
                last[5] = dec.decode_symbol(self._lazy(self.m_classification, last[5]))
            if changed & 4:
                val = dec.decode_symbol(self.m_scan_angle[(last[4] >> 6) & 1])
                last[6] = (val + last[6]) & 0xFF
            if changed & 2:
                last[7] = dec.decode_symbol(self._lazy(self.m_user_data, last[7]))
            if changed & 1:
                last[8] = self.ic_point_source.decompress(dec, last[8])
        else:
            last[3] = self.last_intensity[m]
        diff = self.ic_dx.decompress(dec, self.med_x[m].get(), 1 if n == 1 else 0)
        last[0] = _i32(last[0] + diff)
        self.med_x[m].add(diff)
        kb = self.ic_dx.k
        ctx = (1 if n == 1 else 0) + ((kb & ~1) if kb < 20 else 20)
        diff = self.ic_dy.decompress(dec, self.med_y[m].get(), ctx)
        last[1] = _i32(last[1] + diff)
        self.med_y[m].add(diff)
        kb = (self.ic_dx.k + self.ic_dy.k) // 2
        ctx = (1 if n == 1 else 0) + ((kb & ~1) if kb < 18 else 18)
        last[2] = self.ic_z.decompress(dec, self.last_height[lev], ctx)
        self.last_height[lev] = last[2]
        return list(last)


# -------------------------------------------------------- GPSTIME11 layer

_GPS_MULTI = 500
_GPS_MULTI_MINUS = -10
_GPS_MULTI_UNCHANGED = _GPS_MULTI - _GPS_MULTI_MINUS + 1  # 511
_GPS_MULTI_CODE_FULL = _GPS_MULTI - _GPS_MULTI_MINUS + 2  # 512
_GPS_MULTI_TOTAL = _GPS_MULTI - _GPS_MULTI_MINUS + 6  # 516


def _i64(v: int) -> int:
    v &= 0xFFFFFFFFFFFFFFFF
    return v - 0x10000000000000000 if v >= 0x8000000000000000 else v


class GpsTime11V2:
    """GPSTIME11 v2: four interleaved time sequences, each predicted by an
    integer multiple of its last inter-pulse delta; full 64-bit resync when
    the delta overflows 32 bits."""

    def __init__(self) -> None:
        self.m_multi = ArithmeticModel(_GPS_MULTI_TOTAL)
        self.m_0diff = ArithmeticModel(6)
        self.ic = IntegerCompressor(32, 9)

    def init(self, first_bits: int) -> None:
        self.m_multi.init()
        self.m_0diff.init()
        self.ic = IntegerCompressor(32, 9)
        self.last = 0
        self.next = 0
        self.last_gpstime = [_i64(first_bits), 0, 0, 0]
        self.last_diff = [0, 0, 0, 0]
        self.extreme_counter = [0, 0, 0, 0]

    # -- encode --------------------------------------------------------
    def write(self, enc: ArithmeticEncoder, gps_bits: int) -> None:
        gps = _i64(gps_bits)
        la = self.last
        if self.last_diff[la] == 0:
            if gps == self.last_gpstime[la]:
                enc.encode_symbol(self.m_0diff, 0)
                return
            diff64 = gps - self.last_gpstime[la]
            diff32 = _i32(diff64)
            if diff64 == diff32:
                enc.encode_symbol(self.m_0diff, 1)
                self.ic.compress(enc, 0, diff32, 0)
                self.last_diff[la] = diff32
                self.extreme_counter[la] = 0
                self.last_gpstime[la] = gps
                return
            for i in range(1, 4):
                other64 = gps - self.last_gpstime[(la + i) & 3]
                if other64 == _i32(other64):
                    enc.encode_symbol(self.m_0diff, i + 2)
                    self.last = (la + i) & 3
                    self.write(enc, gps_bits)
                    return
            enc.encode_symbol(self.m_0diff, 2)
            self._write_full(enc, gps)
            return
        if gps == self.last_gpstime[la]:
            enc.encode_symbol(self.m_multi, _GPS_MULTI_UNCHANGED)
            return
        diff64 = gps - self.last_gpstime[la]
        diff32 = _i32(diff64)
        if diff64 == diff32:
            mf = diff32 / self.last_diff[la]
            multi = int(mf + 0.5) if mf >= 0 else int(mf - 0.5)
            if multi == 1:
                enc.encode_symbol(self.m_multi, 1)
                self.ic.compress(enc, self.last_diff[la], diff32, 1)
                self.extreme_counter[la] = 0
            elif multi > 0:
                if multi < _GPS_MULTI:
                    enc.encode_symbol(self.m_multi, multi)
                    self.ic.compress(
                        enc, _i32(multi * self.last_diff[la]), diff32, 2 if multi < 10 else 3
                    )
                else:
                    enc.encode_symbol(self.m_multi, _GPS_MULTI)
                    self.ic.compress(enc, _i32(_GPS_MULTI * self.last_diff[la]), diff32, 4)
                    self._bump_extreme(la, diff32)
            elif multi < 0:
                if multi > _GPS_MULTI_MINUS:
                    enc.encode_symbol(self.m_multi, _GPS_MULTI - multi)
                    self.ic.compress(enc, _i32(multi * self.last_diff[la]), diff32, 5)
                else:
                    enc.encode_symbol(self.m_multi, _GPS_MULTI - _GPS_MULTI_MINUS)
                    self.ic.compress(
                        enc, _i32(_GPS_MULTI_MINUS * self.last_diff[la]), diff32, 6
                    )
                    self._bump_extreme(la, diff32)
            else:
                enc.encode_symbol(self.m_multi, 0)
                self.ic.compress(enc, 0, diff32, 7)
                self._bump_extreme(la, diff32)
            self.last_gpstime[la] = gps
            return
        for i in range(1, 4):
            other64 = gps - self.last_gpstime[(la + i) & 3]
            if other64 == _i32(other64):
                enc.encode_symbol(self.m_multi, _GPS_MULTI_CODE_FULL + i)
                self.last = (la + i) & 3
                self.write(enc, gps_bits)
                return
        enc.encode_symbol(self.m_multi, _GPS_MULTI_CODE_FULL)
        self._write_full(enc, gps)

    def _bump_extreme(self, la: int, diff32: int) -> None:
        self.extreme_counter[la] += 1
        if self.extreme_counter[la] > 3:
            self.last_diff[la] = diff32
            self.extreme_counter[la] = 0

    def _write_full(self, enc: ArithmeticEncoder, gps: int) -> None:
        la = self.last
        self.ic.compress(enc, _i32(self.last_gpstime[la] >> 32), _i32(gps >> 32), 8)
        enc.write_int(gps & 0xFFFFFFFF)
        self.next = (self.next + 1) & 3
        self.last = self.next
        self.last_gpstime[self.last] = gps
        self.last_diff[self.last] = 0
        self.extreme_counter[self.last] = 0

    # -- decode --------------------------------------------------------
    def read(self, dec: ArithmeticDecoder) -> int:
        la = self.last
        if self.last_diff[la] == 0:
            multi = dec.decode_symbol(self.m_0diff)
            if multi == 1:
                d = self.ic.decompress(dec, 0, 0)
                self.last_diff[la] = d
                self.last_gpstime[la] = _i64(self.last_gpstime[la] + d)
                self.extreme_counter[la] = 0
            elif multi == 2:
                self._read_full(dec)
            elif multi > 2:
                self.last = (la + multi - 2) & 3
                return self.read(dec)
        else:
            multi = dec.decode_symbol(self.m_multi)
            if multi == 1:
                d = self.ic.decompress(dec, self.last_diff[la], 1)
                self.last_gpstime[la] = _i64(self.last_gpstime[la] + d)
                self.extreme_counter[la] = 0
            elif multi < _GPS_MULTI_UNCHANGED:
                if multi == 0:
                    d = self.ic.decompress(dec, 0, 7)
                    self._bump_extreme(la, d)
                elif multi < _GPS_MULTI:
                    d = self.ic.decompress(
                        dec, _i32(multi * self.last_diff[la]), 2 if multi < 10 else 3
                    )
                elif multi == _GPS_MULTI:
                    d = self.ic.decompress(dec, _i32(_GPS_MULTI * self.last_diff[la]), 4)
                    self._bump_extreme(la, d)
                else:
                    neg = _GPS_MULTI - multi
                    if neg > _GPS_MULTI_MINUS:
                        d = self.ic.decompress(dec, _i32(neg * self.last_diff[la]), 5)
                    else:
                        d = self.ic.decompress(
                            dec, _i32(_GPS_MULTI_MINUS * self.last_diff[la]), 6
                        )
                        self._bump_extreme(la, d)
                self.last_gpstime[la] = _i64(self.last_gpstime[la] + d)
            elif multi == _GPS_MULTI_CODE_FULL:
                self._read_full(dec)
            elif multi > _GPS_MULTI_CODE_FULL:
                self.last = (la + multi - _GPS_MULTI_CODE_FULL) & 3
                return self.read(dec)
        return self.last_gpstime[self.last] & 0xFFFFFFFFFFFFFFFF

    def _read_full(self, dec: ArithmeticDecoder) -> None:
        la = self.last
        self.next = (self.next + 1) & 3
        hi = self.ic.decompress(dec, _i32(self.last_gpstime[la] >> 32), 8)
        val = _i64((hi << 32) | dec.read_int())
        self.last = self.next
        self.last_gpstime[self.last] = val
        self.last_diff[self.last] = 0
        self.extreme_counter[self.last] = 0


# ------------------------------------------------------- file container

_LASZIP_USER_ID = b"laszip encoded\x00\x00"
_LASZIP_RECORD_ID = 22204
_COMPRESSOR_POINTWISE_CHUNKED = 2
_ITEM_POINT10 = 6
_ITEM_GPSTIME11 = 7
_ITEM_RGB12 = 8
_ITEM_BYTE = 0
_HDR12 = 227
_PT_LEN = {0: 20, 1: 28, 2: 26, 3: 34}
_DEFAULT_CHUNK = 50000


def _laszip_vlr(point_format: int, chunk_size: int, extra_bytes: int = 0) -> bytes:
    """LASzip VLR payload + 54-byte VLR header (public VLR layout)."""
    items = [(_ITEM_POINT10, 20, 2)]
    if point_format in (1, 3):
        items.append((_ITEM_GPSTIME11, 8, 2))
    if point_format in (2, 3):
        items.append((_ITEM_RGB12, 6, 2))
    if extra_bytes:
        items.append((_ITEM_BYTE, extra_bytes, 2))
    payload = struct.pack(
        "<HHBBHIIqqH",
        _COMPRESSOR_POINTWISE_CHUNKED,  # compressor
        0,  # coder: arithmetic
        2, 4, 3,  # version major/minor/revision
        0,  # options
        chunk_size,
        -1, -1,  # no special EVLRs
        len(items),
    )
    for t, s, v in items:
        payload += struct.pack("<HHH", t, s, v)
    vlr_header = struct.pack(
        "<H16sHH32s", 0, _LASZIP_USER_ID, _LASZIP_RECORD_ID, len(payload),
        b"dronedb_spark laz".ljust(32, b"\x00"),
    )
    return vlr_header + payload


def _parse_laszip_vlr(data: bytes, header_size: int, n_vlrs: int) -> dict:
    pos = header_size
    for _ in range(n_vlrs):
        user_id = data[pos + 2 : pos + 18]
        (record_id,) = struct.unpack_from("<H", data, pos + 18)
        (rec_len,) = struct.unpack_from("<H", data, pos + 20)
        body = data[pos + 54 : pos + 54 + rec_len]
        pos += 54 + rec_len
        if user_id.rstrip(b"\x00") == b"laszip encoded" and record_id == _LASZIP_RECORD_ID:
            compressor, coder, vmaj, vmin, vrev, options, chunk_size, n_evlr, off_evlr, n_items = (
                struct.unpack_from("<HHBBHIIqqH", body, 0)
            )
            items = [
                struct.unpack_from("<HHH", body, 34 + 6 * i) for i in range(n_items)
            ]
            return {
                "compressor": compressor,
                "coder": coder,
                "chunk_size": chunk_size,
                "items": items,
            }
    raise ValueError("no LASzip VLR found")


def is_laz(data: bytes) -> bool:
    """True when a LAS container carries a laszip-encoded VLR.

    Walks the VLR headers from the LAS header's recorded header_size /
    n_vlrs instead of byte-sniffing a fixed window: a file whose laszip
    VLR sits behind large preceding VLRs (e.g. a full set of waveform
    descriptor records) has the magic string past any fixed offset, and
    a byte scan would silently route it to the uncompressed decoder."""
    if len(data) < 104 or data[:4] != b"LASF":
        return False
    (header_size,) = struct.unpack_from("<H", data, 94)
    (n_vlrs,) = struct.unpack_from("<I", data, 100)
    pos = header_size
    for _ in range(n_vlrs):
        if pos + 54 > len(data):
            return False
        user_id = data[pos + 2 : pos + 18].rstrip(b"\x00")
        (record_id,) = struct.unpack_from("<H", data, pos + 18)
        (rec_len,) = struct.unpack_from("<H", data, pos + 20)
        if user_id == b"laszip encoded" and record_id == _LASZIP_RECORD_ID:
            return True
        pos += 54 + rec_len
    return False


def encode_laz(
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    classification: np.ndarray | None = None,
    intensity: np.ndarray | None = None,
    gps_time: np.ndarray | None = None,
    rgb: np.ndarray | None = None,
    extra: np.ndarray | None = None,
    scale: tuple[float, float, float] = (0.001, 0.001, 0.001),
    offset: tuple[float, float, float] = (0.0, 0.0, 0.0),
    chunk_size: int = _DEFAULT_CHUNK,
) -> bytes:
    """Write a LAZ-compressed LAS 1.2 file (point format 0/1/2/3 chosen
    from gps_time/rgb presence).  Coordinates quantize to the scale/offset
    grid exactly as ``encode_las`` does, so LAS and LAZ round-trip
    identically."""
    n = len(x)
    fmt = (1 if gps_time is not None else 0) | (2 if rgb is not None else 0)
    classification = (
        np.zeros(n, dtype=np.uint8) if classification is None else classification.astype(np.uint8)
    )
    intensity = (
        np.zeros(n, dtype=np.uint16) if intensity is None else intensity.astype(np.uint16)
    )
    xi = np.round((np.asarray(x, dtype=np.float64) - offset[0]) / scale[0]).astype(np.int32)
    yi = np.round((np.asarray(y, dtype=np.float64) - offset[1]) / scale[1]).astype(np.int32)
    zi = np.round((np.asarray(z, dtype=np.float64) - offset[2]) / scale[2]).astype(np.int32)
    xd, yd, zd = (xi * scale[0] + offset[0], yi * scale[1] + offset[1], zi * scale[2] + offset[2])
    gps_bits = (
        np.asarray(gps_time, dtype=np.float64).view(np.uint64) if fmt & 1 else None
    )
    rgb_arr = np.asarray(rgb, dtype=np.uint16) if fmt & 2 else None
    extra_arr = np.asarray(extra, dtype=np.uint8) if extra is not None else None
    n_extra = extra_arr.shape[1] if extra_arr is not None else 0

    vlr = _laszip_vlr(fmt, chunk_size, n_extra)
    header = bytearray(_HDR12)
    header[0:4] = b"LASF"
    header[24] = 1
    header[25] = 2
    header[26:58] = b"dronedb_spark".ljust(32, b"\x00")
    header[58:90] = b"encode_laz".ljust(32, b"\x00")
    struct.pack_into("<HH", header, 90, 1, 2024)
    struct.pack_into("<H", header, 94, _HDR12)
    struct.pack_into("<I", header, 96, _HDR12 + len(vlr))  # point data offset
    struct.pack_into("<I", header, 100, 1)  # one VLR (laszip)
    header[104] = fmt | 0x80  # high bit flags LAZ compression
    struct.pack_into("<H", header, 105, _PT_LEN[fmt] + n_extra)
    struct.pack_into("<I", header, 107, n)
    struct.pack_into("<5I", header, 111, n, 0, 0, 0, 0)
    struct.pack_into("<3d", header, 131, *scale)
    struct.pack_into("<3d", header, 155, *offset)
    struct.pack_into(
        "<6d", header, 179,
        float(xd.max()) if n else 0.0, float(xd.min()) if n else 0.0,
        float(yd.max()) if n else 0.0, float(yd.min()) if n else 0.0,
        float(zd.max()) if n else 0.0, float(zd.min()) if n else 0.0,
    )

    flags = 0b00001001  # single return, return #1 (matches encode_las)
    chunks: list[bytes] = []
    for start in range(0, n, chunk_size):
        end = min(start + chunk_size, n)
        buf = bytearray()
        p10 = Point10V2()
        gps11 = GpsTime11V2()
        rgb12 = Rgb12V2()
        first = [
            int(xi[start]), int(yi[start]), int(zi[start]), int(intensity[start]),
            flags, int(classification[start]), 0, 0, 0,
        ]
        buf += _P10.pack(*first)
        if fmt & 1:
            buf += struct.pack("<Q", int(gps_bits[start]))
        if fmt & 2:
            buf += struct.pack("<3H", *(int(v) for v in rgb_arr[start]))
        if n_extra:
            buf += extra_arr[start].tobytes()
        p10.init(first)
        if fmt & 1:
            gps11.init(int(gps_bits[start]))
        if fmt & 2:
            rgb12.init(tuple(int(v) for v in rgb_arr[start]))
        byte_v2 = ByteV2(n_extra) if n_extra else None
        if byte_v2:
            byte_v2.init(extra_arr[start].tobytes())
        enc = ArithmeticEncoder()
        for i in range(start + 1, end):
            cur = [
                int(xi[i]), int(yi[i]), int(zi[i]), int(intensity[i]),
                flags, int(classification[i]), 0, 0, 0,
            ]
            p10.write(enc, cur)
            if fmt & 1:
                gps11.write(enc, int(gps_bits[i]))
            if fmt & 2:
                rgb12.write(enc, tuple(int(v) for v in rgb_arr[i]))
            if byte_v2:
                byte_v2.write(enc, extra_arr[i].tobytes())
        buf += enc.done()
        chunks.append(bytes(buf))

    point_start = _HDR12 + len(vlr)
    body = bytearray()
    body += b"\x00" * 8  # chunk-table offset placeholder
    for c in chunks:
        body += c
    table_offset = point_start + len(body)
    struct.pack_into("<q", body, 0, table_offset)
    # chunk table: u32 version, u32 count, then byte sizes via a 32-bit
    # IntegerCompressor (context 1, predecessor-predicted)
    body += struct.pack("<II", 0, len(chunks))
    if chunks:
        tenc = ArithmeticEncoder()
        tic = IntegerCompressor(32, 2)
        prev = 0
        for c in chunks:
            tic.compress(tenc, prev, len(c), 1)
            prev = len(c)
        body += tenc.done()
    return bytes(header) + vlr + bytes(body)


def decode_laz(data: bytes) -> dict[str, np.ndarray]:
    """Decode a chunked LAZ file → same dict layout as ``decode_las``."""
    from dronedb_spark.sources.las import las_info

    info = las_info(data)
    if not info["compressed"]:
        raise ValueError("not LAZ-compressed; use decode_las")
    fmt, n = info["point_format"], info["n_points"]
    if fmt in (6, 7, 8):
        from dronedb_spark.sources.laz14 import decode_laz14

        return decode_laz14(data)
    if fmt not in _PT_LEN:
        raise NotImplementedError(f"LAZ point format {fmt}")
    (header_size,) = struct.unpack_from("<H", data, 94)
    (n_vlrs,) = struct.unpack_from("<I", data, 100)
    vlr = _parse_laszip_vlr(data, header_size, n_vlrs)
    if vlr["compressor"] != _COMPRESSOR_POINTWISE_CHUNKED or vlr["coder"] != 0:
        raise NotImplementedError(f"LAZ compressor {vlr['compressor']} coder {vlr['coder']}")
    expect = (
        [(_ITEM_POINT10, 20, 2)]
        + ([(_ITEM_GPSTIME11, 8, 2)] if fmt & 1 else [])
        + ([(_ITEM_RGB12, 6, 2)] if fmt & 2 else [])
    )
    got_items = [tuple(i) for i in vlr["items"]]
    n_extra = 0
    if got_items[: len(expect)] == expect and len(got_items) == len(expect) + 1:
        t_, sz_, v_ = got_items[-1]
        if t_ == _ITEM_BYTE and v_ == 2:
            n_extra = sz_
            got_items = got_items[:-1]
    if got_items != expect:
        raise NotImplementedError(f"LAZ item layout {vlr['items']}")
    chunk_size = vlr["chunk_size"]
    point_start = info["point_data_offset"]

    (table_offset,) = struct.unpack_from("<q", data, point_start)
    _version, n_chunks = struct.unpack_from("<II", data, table_offset)
    sizes: list[int] = []
    if n_chunks:
        tdec = ArithmeticDecoder(data, table_offset + 8)
        tic = IntegerCompressor(32, 2)
        prev = 0
        for _ in range(n_chunks):
            prev = tic.decompress(tdec, prev, 1)
            sizes.append(prev)

    raw_len = _PT_LEN[fmt]
    out_x = np.empty(n, dtype=np.int64)
    out_y = np.empty(n, dtype=np.int64)
    out_z = np.empty(n, dtype=np.int64)
    out_int = np.empty(n, dtype=np.int64)
    out_cls = np.empty(n, dtype=np.int64)
    out_flags = np.empty(n, dtype=np.int64)
    out_gps = np.empty(n, dtype=np.uint64) if fmt & 1 else None
    out_rgb = np.empty((n, 3), dtype=np.int64) if fmt & 2 else None
    out_extra = np.empty((n, n_extra), dtype=np.uint8) if n_extra else None

    pos = point_start + 8
    idx = 0
    for size in sizes:
        chunk_end = pos + size
        remaining = n - idx
        count = min(chunk_size, remaining)
        first = list(_P10.unpack_from(data, pos))
        pos += 20
        if fmt & 1:
            (gps,) = struct.unpack_from("<Q", data, pos)
            pos += 8
        if fmt & 2:
            rgb0 = struct.unpack_from("<3H", data, pos)
            pos += 6
        if n_extra:
            extra0 = data[pos : pos + n_extra]
            pos += n_extra
        p10 = Point10V2()
        p10.init(first)
        if fmt & 1:
            gps11 = GpsTime11V2()
            gps11.init(gps)
            out_gps[idx] = gps
        if fmt & 2:
            rgb12 = Rgb12V2()
            rgb12.init(rgb0)
            out_rgb[idx] = rgb0
        if n_extra:
            byte_v2 = ByteV2(n_extra)
            byte_v2.init(extra0)
            out_extra[idx] = np.frombuffer(extra0, dtype=np.uint8)
        out_x[idx], out_y[idx], out_z[idx] = first[0], first[1], first[2]
        out_int[idx], out_flags[idx], out_cls[idx] = first[3], first[4], first[5]
        idx += 1
        if count > 1:
            dec = ArithmeticDecoder(data, pos)
            for _ in range(count - 1):
                p = p10.read(dec)
                out_x[idx], out_y[idx], out_z[idx] = p[0], p[1], p[2]
                out_int[idx], out_flags[idx], out_cls[idx] = p[3], p[4], p[5]
                if fmt & 1:
                    out_gps[idx] = gps11.read(dec)
                if fmt & 2:
                    out_rgb[idx] = rgb12.read(dec)
                if n_extra:
                    out_extra[idx] = np.frombuffer(byte_v2.read(dec), dtype=np.uint8)
                idx += 1
        pos = chunk_end
    if idx != n:
        raise ValueError(f"LAZ decode: {idx} points decoded, header says {n}")

    sx, sy, sz = info["scale"]
    ox, oy, oz = info["offset"]
    out = {
        "x": out_x * sx + ox,
        "y": out_y * sy + oy,
        "z": out_z * sz + oz,
        "intensity": out_int,
        "classification": out_cls,
        "return_number": out_flags & 0x07,
    }
    if fmt & 1:
        out["gps_time"] = out_gps.view(np.float64).copy()
    if fmt & 2:
        out["red"] = out_rgb[:, 0]
        out["green"] = out_rgb[:, 1]
        out["blue"] = out_rgb[:, 2]
    if n_extra:
        out["extra_bytes"] = out_extra
    return out


# ------------------------------------------------------------ RGB12 layer


def _u8_clamp(x: int) -> int:
    return 0 if x < 0 else (255 if x > 255 else x)


def _div2(x: int) -> int:
    """C-style truncation toward zero (Python // floors negatives)."""
    return -((-x) >> 1) if x < 0 else x >> 1


class Rgb12V2:
    """RGB12 v2: a 7-bit change mask picks which of the six color bytes
    differ; low bytes predict green/blue from the red delta chain."""

    def __init__(self) -> None:
        self.m_byte_used = ArithmeticModel(128)
        self.m_diff = [ArithmeticModel(256) for _ in range(6)]

    def init(self, first: tuple[int, int, int]) -> None:
        self.m_byte_used.init()
        for m in self.m_diff:
            m.init()
        self.last = list(first)

    def write(self, enc: ArithmeticEncoder, rgb: tuple[int, int, int]) -> None:
        r, g, b = rgb
        lr, lg, lb = self.last
        sym = (
            ((lr & 255) != (r & 255)) << 0
            | ((lr >> 8) != (r >> 8)) << 1
            | ((lg & 255) != (g & 255)) << 2
            | ((lg >> 8) != (g >> 8)) << 3
            | ((lb & 255) != (b & 255)) << 4
            | ((lb >> 8) != (b >> 8)) << 5
        )
        sym |= (
            ((r & 255) != (g & 255)) or ((r & 255) != (b & 255))
            or ((r >> 8) != (g >> 8)) or ((r >> 8) != (b >> 8))
        ) << 6
        enc.encode_symbol(self.m_byte_used, sym)
        if sym & 1:
            enc.encode_symbol(self.m_diff[0], ((r & 255) - (lr & 255)) & 0xFF)
        if sym & 2:
            enc.encode_symbol(self.m_diff[1], ((r >> 8) - (lr >> 8)) & 0xFF)
        if sym & 64:
            diff = (r & 255) - (lr & 255)
            if sym & 4:
                enc.encode_symbol(
                    self.m_diff[2], ((g & 255) - _u8_clamp(diff + (lg & 255))) & 0xFF
                )
            if sym & 16:
                diff = _div2(diff + (g & 255) - (lg & 255))
                enc.encode_symbol(
                    self.m_diff[4], ((b & 255) - _u8_clamp(diff + (lb & 255))) & 0xFF
                )
            diff = (r >> 8) - (lr >> 8)
            if sym & 8:
                enc.encode_symbol(
                    self.m_diff[3], ((g >> 8) - _u8_clamp(diff + (lg >> 8))) & 0xFF
                )
            if sym & 32:
                diff = _div2(diff + (g >> 8) - (lg >> 8))
                enc.encode_symbol(
                    self.m_diff[5], ((b >> 8) - _u8_clamp(diff + (lb >> 8))) & 0xFF
                )
        self.last = [r, g, b]

    def read(self, dec: ArithmeticDecoder) -> tuple[int, int, int]:
        lr, lg, lb = self.last
        sym = dec.decode_symbol(self.m_byte_used)
        if sym & 1:
            r = (dec.decode_symbol(self.m_diff[0]) + (lr & 255)) & 0xFF
        else:
            r = lr & 0xFF
        if sym & 2:
            r |= ((dec.decode_symbol(self.m_diff[1]) + (lr >> 8)) & 0xFF) << 8
        else:
            r |= lr & 0xFF00
        if sym & 64:
            diff = (r & 255) - (lr & 255)
            if sym & 4:
                g = (dec.decode_symbol(self.m_diff[2]) + _u8_clamp(diff + (lg & 255))) & 0xFF
            else:
                g = lg & 0xFF
            if sym & 16:
                diff = _div2(diff + (g & 255) - (lg & 255))
                b = (dec.decode_symbol(self.m_diff[4]) + _u8_clamp(diff + (lb & 255))) & 0xFF
            else:
                b = lb & 0xFF
            diff = (r >> 8) - (lr >> 8)
            if sym & 8:
                g |= ((dec.decode_symbol(self.m_diff[3]) + _u8_clamp(diff + (lg >> 8))) & 0xFF) << 8
            else:
                g |= lg & 0xFF00
            if sym & 32:
                diff = _div2(diff + (g >> 8) - (lg >> 8))
                b |= ((dec.decode_symbol(self.m_diff[5]) + _u8_clamp(diff + (lb >> 8))) & 0xFF) << 8
            else:
                b |= lb & 0xFF00
        else:
            g = b = r
        self.last = [r, g, b]
        return r, g, b


# ------------------------------------------------------------- BYTE layer


class ByteV2:
    """BYTE v2: n independent per-byte delta models — the LASzip item for
    extra per-point attribute bytes beyond the base record."""

    def __init__(self, n: int) -> None:
        self.n = n
        self.models = [ArithmeticModel(256) for _ in range(n)]

    def init(self, first: bytes) -> None:
        for m in self.models:
            m.init()
        self.last = list(first)

    def write(self, enc: ArithmeticEncoder, cur: bytes) -> None:
        for i in range(self.n):
            enc.encode_symbol(self.models[i], (cur[i] - self.last[i]) & 0xFF)
        self.last = list(cur)

    def read(self, dec: ArithmeticDecoder) -> bytes:
        for i in range(self.n):
            self.last[i] = (dec.decode_symbol(self.models[i]) + self.last[i]) & 0xFF
        return bytes(self.last)
