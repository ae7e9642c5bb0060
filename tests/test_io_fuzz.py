"""I/O robustness fuzzing: corrupt and truncated BGZF/BAM inputs.

The native reader (``io/csrc/bamio.cpp``) runs in-process via ctypes, so a
missing bounds check is a pytest-killing segfault or a multi-GB allocation,
not a catchable failure. These tests drive every documented error path and
a deterministic fuzz sweep over both the compressed container and the
uncompressed record stream; the contract under corruption is: either a
clean ``IOError`` with a message, or a successful parse with sane
invariants (truncation at a block boundary is indistinguishable from EOF
by design — the reference's htslib behaves the same way without the
optional EOF-marker check).

Reference parity: the reference delegates robustness to htslib
(``/root/reference/libs/bam-api/src/bam_api.cpp:359-507``) and has no fuzz
coverage of its own (SURVEY.md section 4); this suite is new hardening.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from genome_downsampler_tpu.config import BamApiConfig
from genome_downsampler_tpu.io.bam import read_bam, write_bam
from genome_downsampler_tpu.testing.bam_writer import (
    _BGZF_EOF,
    _bgzf_compress,
    write_test_bam,
)
from genome_downsampler_tpu.testing.fixtures import small_example_batch

CONFIG = BamApiConfig(min_mapq=0, min_seq_length=0)


@pytest.fixture(scope="module")
def valid_bam(tmp_path_factory):
    path = tmp_path_factory.mktemp("fuzz") / "valid.bam"
    write_test_bam(str(path), small_example_batch())
    return path


def _read_outcome(path) -> tuple[bool, int]:
    """(parsed_ok, n_reads); IOError counts as a clean rejection."""
    try:
        batch, _, _ = read_bam(str(path), CONFIG)
    except IOError:
        return False, 0
    assert batch.n_reads >= 0
    assert batch.n_reads % 2 == 0  # pairs stay adjacent
    if batch.n_reads:
        # end == start - 1 is legal: a fully-soft-clipped CIGAR consumes no
        # reference (end = pos + rlen - 1 with rlen = 0, like the
        # reference's read.cpp:11-13)
        assert (batch.end >= batch.start - 1).all()
    return True, batch.n_reads


def _decode_payload(blob: bytes) -> bytes:
    """Decompress a BGZF stream produced by _bgzf_compress (XLEN=6)."""
    out = bytearray()
    i = 0
    while i < len(blob):
        assert blob[i] == 0x1F and blob[i + 1] == 0x8B
        bsize = struct.unpack("<H", blob[i + 16 : i + 18])[0] + 1
        cdata = blob[i + 18 : i + bsize - 8]
        out += zlib.decompress(cdata, -15)
        i += bsize
    return bytes(out)


def _encode_payload(payload: bytes) -> bytes:
    return _bgzf_compress(payload) + _BGZF_EOF


# --------------------------------------------------------- container level


def test_truncation_sweep(valid_bam, tmp_path):
    """Cutting the file at any byte must never crash the parser."""
    blob = valid_bam.read_bytes()
    cuts = sorted(
        {1, 4, 17, 18, 19, len(blob) - 1, len(blob) - 28}
        | set(range(0, len(blob), max(1, len(blob) // 64)))
    )
    n_ok = n_rej = 0
    for cut in cuts:
        p = tmp_path / "trunc.bam"
        p.write_bytes(blob[:cut])
        ok, _ = _read_outcome(p)
        n_ok += ok
        n_rej += not ok
    assert n_rej > 0  # mid-block cuts must be rejected, not misread


def test_bitflip_sweep_compressed(valid_bam, tmp_path):
    """Byte corruption anywhere in the container: clean reject or parse."""
    blob = bytearray(valid_bam.read_bytes())
    rng = np.random.default_rng(20260820)
    # dense coverage of the first block header + random body positions
    offsets = list(range(0, 40)) + sorted(
        rng.integers(0, len(blob), 160).tolist()
    )
    for off in offsets:
        for flip in (0xFF, 0x80, 0x01):
            mut = bytearray(blob)
            mut[off] ^= flip
            p = tmp_path / "flip.bam"
            p.write_bytes(bytes(mut))
            _read_outcome(p)


def test_bad_bsize_underflow(valid_bam, tmp_path):
    """BSIZE smaller than the fixed header must not underflow the read
    length (pre-hardening this wrapped to a multi-GB fread)."""
    blob = bytearray(valid_bam.read_bytes())
    blob[16:18] = struct.pack("<H", 5)
    p = tmp_path / "bsize.bam"
    p.write_bytes(bytes(blob))
    with pytest.raises(IOError):
        read_bam(str(p), CONFIG)


def test_bad_isize(valid_bam, tmp_path):
    """ISIZE beyond the 64 KiB BGZF cap must be rejected, not allocated."""
    blob = bytearray(valid_bam.read_bytes())
    bsize = struct.unpack("<H", blob[16:18])[0] + 1
    blob[bsize - 4 : bsize] = struct.pack("<I", 0xFFFFFFFF)
    p = tmp_path / "isize.bam"
    p.write_bytes(bytes(blob))
    with pytest.raises(IOError):
        read_bam(str(p), CONFIG)


def test_not_gzip(tmp_path):
    p = tmp_path / "noise.bam"
    p.write_bytes(b"this is not a BAM file at all" * 10)
    with pytest.raises(IOError):
        read_bam(str(p), CONFIG)


def test_empty_file(tmp_path):
    p = tmp_path / "empty.bam"
    p.write_bytes(b"")
    with pytest.raises(IOError):
        read_bam(str(p), CONFIG)


# The reference auto-detects SAM/BAM/CRAM via htslib (bam_api.cpp:379); this
# reader is BAM-only, and the deviation contract is a format-NAMING error
# for each sibling format (VERDICT r3 #8).


def test_cram_magic_named(tmp_path):
    p = tmp_path / "input.cram"
    p.write_bytes(b"CRAM\x03\x00" + b"\x00" * 64)
    with pytest.raises(IOError, match="CRAM"):
        read_bam(str(p), CONFIG)


def test_sam_text_named(tmp_path):
    p = tmp_path / "input.sam"
    p.write_bytes(
        b"@HD\tVN:1.6\tSO:coordinate\n"
        b"@SQ\tSN:ref\tLN:11\n"
        b"r1\t99\tref\t1\t60\t4M\t=\t5\t8\tACGT\tFFFF\n"
    )
    with pytest.raises(IOError, match="SAM"):
        read_bam(str(p), CONFIG)


def test_plain_gzip_named(tmp_path):
    p = tmp_path / "input.bam.gz"
    # gzip member WITHOUT FEXTRA: cannot be BGZF
    p.write_bytes(
        b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
        + zlib.compress(b"BAM\x01" + b"\x00" * 32)[2:-4]
    )
    with pytest.raises(IOError, match="gzip"):
        read_bam(str(p), CONFIG)


def test_uncompressed_bam_named(tmp_path):
    p = tmp_path / "raw.bam"
    p.write_bytes(b"BAM\x01" + struct.pack("<i", 0) + b"\x00" * 16)
    with pytest.raises(IOError, match="uncompressed"):
        read_bam(str(p), CONFIG)


# ------------------------------------------------------------ record level


def _payload_case(valid_bam, tmp_path, mutate):
    payload = bytearray(_decode_payload(valid_bam.read_bytes()))
    mutate(payload)
    p = tmp_path / "mut.bam"
    p.write_bytes(_encode_payload(bytes(payload)))
    return p


def test_bad_magic(valid_bam, tmp_path):
    p = _payload_case(
        valid_bam, tmp_path, lambda b: b.__setitem__(slice(0, 4), b"CRAM")
    )
    with pytest.raises(IOError, match="magic"):
        read_bam(str(p), CONFIG)


def test_negative_l_text(valid_bam, tmp_path):
    p = _payload_case(
        valid_bam, tmp_path,
        lambda b: b.__setitem__(slice(4, 8), struct.pack("<i", -5)),
    )
    with pytest.raises(IOError):
        read_bam(str(p), CONFIG)


def test_negative_n_ref(valid_bam, tmp_path):
    def mut(b):
        l_text = struct.unpack("<i", b[4:8])[0]
        off = 8 + l_text
        b[off : off + 4] = struct.pack("<i", -1)

    with pytest.raises(IOError):
        read_bam(str(_payload_case(valid_bam, tmp_path, mut)), CONFIG)


def test_huge_ref_name_len(valid_bam, tmp_path):
    def mut(b):
        l_text = struct.unpack("<i", b[4:8])[0]
        off = 12 + l_text
        b[off : off + 4] = struct.pack("<i", 1 << 30)

    with pytest.raises(IOError):
        read_bam(str(_payload_case(valid_bam, tmp_path, mut)), CONFIG)


def _first_record_off(payload: bytes) -> int:
    l_text = struct.unpack("<i", payload[4:8])[0]
    off = 8 + l_text
    n_ref = struct.unpack("<i", payload[off : off + 4])[0]
    off += 4
    for _ in range(n_ref):
        l_name = struct.unpack("<i", payload[off : off + 4])[0]
        off += 8 + l_name
    return off


def test_record_block_too_small(valid_bam, tmp_path):
    def mut(b):
        off = _first_record_off(bytes(b))
        b[off : off + 4] = struct.pack("<i", 8)

    with pytest.raises(IOError, match="block size"):
        read_bam(str(_payload_case(valid_bam, tmp_path, mut)), CONFIG)


def test_record_negative_block_size(valid_bam, tmp_path):
    def mut(b):
        off = _first_record_off(bytes(b))
        b[off : off + 4] = struct.pack("<i", -100)

    with pytest.raises(IOError, match="block size"):
        read_bam(str(_payload_case(valid_bam, tmp_path, mut)), CONFIG)


def test_record_name_cigar_overflow(valid_bam, tmp_path):
    """l_read_name + cigar escaping the record block must be rejected (an
    out-of-bounds read of the cigar ops pre-hardening)."""

    def mut(b):
        off = _first_record_off(bytes(b))
        b[off + 4 + 12 : off + 4 + 14] = struct.pack("<H", 0xFFFF)

    with pytest.raises(IOError, match="exceed"):
        read_bam(str(_payload_case(valid_bam, tmp_path, mut)), CONFIG)


def test_bitflip_sweep_payload(valid_bam, tmp_path):
    """Fuzz the uncompressed record stream (container stays valid), hitting
    the BAM record parser rather than zlib."""
    payload = _decode_payload(valid_bam.read_bytes())
    rec0 = _first_record_off(payload)
    rng = np.random.default_rng(7)
    offsets = list(range(rec0, min(rec0 + 40, len(payload)))) + sorted(
        rng.integers(0, len(payload), 160).tolist()
    )
    for off in offsets:
        for flip in (0xFF, 0x80, 0x01):
            mut = bytearray(payload)
            mut[off] ^= flip
            p = tmp_path / "pflip.bam"
            p.write_bytes(_encode_payload(bytes(mut)))
            _read_outcome(p)


# ------------------------------------------------------------- writer path


def test_writer_on_corrupt_input(valid_bam, tmp_path):
    """The re-stream writer scans the input itself; corrupt records must
    surface as IOError, and a clean input with out-of-range ids must too."""
    blob = bytearray(valid_bam.read_bytes())
    blob[16:18] = struct.pack("<H", 5)
    bad = tmp_path / "bad_in.bam"
    bad.write_bytes(bytes(blob))
    with pytest.raises(IOError):
        write_bam(str(bad), str(tmp_path / "o1.bam"), np.array([0, 1]))

    payload = bytearray(_decode_payload(valid_bam.read_bytes()))
    off = _first_record_off(bytes(payload))
    payload[off : off + 4] = struct.pack("<i", -1)
    bad2 = tmp_path / "bad_rec.bam"
    bad2.write_bytes(_encode_payload(bytes(payload)))
    with pytest.raises(IOError, match="block size"):
        write_bam(str(bad2), str(tmp_path / "o2.bam"), np.array([0, 1]))


def test_zero_span_reads_through_solvers():
    """Fully-soft-clipped reads (reference span 0, end == start - 1) occur
    in real BAMs; every registered solver must tolerate them via the
    registry's SpanGuard and still produce a valid minimal selection."""
    from genome_downsampler_tpu.core.readbatch import ReadBatch
    from genome_downsampler_tpu.solvers.registry import default_registry

    def cov(n, s, e):
        c = np.zeros(n + 1, np.int64)
        np.add.at(c, np.clip(s, 0, n), 1)
        np.add.at(c, np.clip(e + 1, 0, n), -1)
        return np.cumsum(c)[:n]

    base = small_example_batch()
    nz = base.n_reads
    batch = ReadBatch(
        bam_id=np.concatenate([base.bam_id, [nz, nz + 1]]),
        start=np.concatenate([base.start, [5, 5]]),
        end=np.concatenate([base.end, [4, 4]]),  # span 0
        quality=np.concatenate([base.quality, [99, 99]]),
        seq_length=np.concatenate([base.seq_length, [150, 150]]),
        is_first=np.concatenate([base.is_first, [True, False]]),
        ref_genome_length=base.ref_genome_length,
    )
    n = batch.ref_genome_length
    target = np.minimum(cov(n, base.start, base.end), 4)
    reg = default_registry()
    for name in reg.get_names():
        if name == "test":
            continue
        sel = np.asarray(reg.get(name).solve(4, batch), np.int64)
        got = cov(n, batch.start[sel], batch.end[sel])
        assert (got >= target).all(), name
        assert nz not in sel and nz + 1 not in sel, (
            f"{name} selected a zero-span read"
        )


def test_writer_truncated_input(valid_bam, tmp_path):
    blob = valid_bam.read_bytes()
    trunc = tmp_path / "trunc_in.bam"
    trunc.write_bytes(blob[: len(blob) // 2])
    with pytest.raises(IOError):
        write_bam(str(trunc), str(tmp_path / "o3.bam"),
                  np.arange(16, dtype=np.int64))


def test_truncated_record_stream_in_valid_bgzf(valid_bam, tmp_path):
    """r5 review finding: a record stream cut mid-record but re-wrapped in
    VALID BGZF blocks (writer crash / interrupted copy that flushed whole
    blocks) must error, not silently drop the tail — the batch-parallel
    scan's carry buffer holds the partial record at EOF."""
    payload = _decode_payload(valid_bam.read_bytes())
    for cut in (3, 7, 40):
        p = tmp_path / f"trunc_{cut}.bam"
        p.write_bytes(_encode_payload(payload[:-cut]))
        ok, _ = _read_outcome(p)
        assert not ok, f"truncated-by-{cut} BAM accepted silently"
