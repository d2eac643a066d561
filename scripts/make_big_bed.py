"""Generate a north-star-scale PLINK .bed/.bim/.fam trio for the
disk-streamed GBLUP benchmark (bench.py section "diskstream").

Writes `<prefix>.bed` (50_000 x 500_000 by default, 6.25 GB) with complete
diploid calls — every 2-bit field is drawn from {00, 10, 11} (hom A1 / het /
hom A2); the missing code 01 never appears, so the exact int8 dosage path
(streaming.gblup_from_bed_pieces) applies. Bytes are synthesized directly via
an 81-entry valid-byte LUT, so generation is one RNG pass + one gather —
no 200 GB float panel ever exists. When n % 4 != 0 the padding bit-pairs of
each SNP's final byte are masked to the zero bits the PLINK spec requires, and
a minimal `.bim` is written alongside, so the trio loads in external tools
(plink/bed-reader), not just this repo's streamer.

Usage: python scripts/make_big_bed.py [prefix] [n] [p]
Defaults: /tmp/big_panel 50000 500000
"""

import sys

import numpy as np

_BED_MAGIC = b"\x6c\x1b\x01"
_VALID_CODES = (0, 2, 3)  # hom/het/hom; 1 = missing, excluded


def valid_byte_lut() -> np.ndarray:
    """All 81 bytes whose four 2-bit genotype fields avoid the missing code."""
    out = []
    for a in _VALID_CODES:
        for b in _VALID_CODES:
            for c in _VALID_CODES:
                for d in _VALID_CODES:
                    out.append(a | (b << 2) | (c << 4) | (d << 6))
    return np.array(out, dtype=np.uint8)


def main() -> None:
    prefix = sys.argv[1] if len(sys.argv) > 1 else "/tmp/big_panel"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    p = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
    bytes_per_snp = (n + 3) // 4
    total = bytes_per_snp * p
    lut = valid_byte_lut()
    rng = np.random.default_rng(7)
    chunk = 256 * 1024 * 1024
    # PLINK requires the unused high bit-pairs of each SNP's last byte to be
    # zero when n % 4 != 0; keep only the low 2*(n%4) bits of those bytes.
    pad = n % 4
    tail_mask = np.uint8((1 << (2 * pad)) - 1) if pad else np.uint8(0xFF)
    with open(prefix + ".bed", "wb") as fh:
        fh.write(_BED_MAGIC)
        written = 0
        while written < total:
            m = min(chunk, total - written)
            idx = rng.integers(0, len(lut), size=m, dtype=np.uint8)
            buf = lut[idx]
            if pad:
                pos = written + np.arange(m, dtype=np.int64)
                buf[pos % bytes_per_snp == bytes_per_snp - 1] &= tail_mask
            fh.write(buf.tobytes())
            written += m
            print(f"\r{written / total:6.1%}", end="", file=sys.stderr, flush=True)
    print(file=sys.stderr)
    with open(prefix + ".fam", "w") as fh:
        fh.writelines(f"pop_1\te{i:06d}\t0\t0\t0\t-9\n" for i in range(n))
    with open(prefix + ".bim", "w") as fh:
        fh.writelines(f"1\tsnp{i:07d}\t0\t{i + 1}\tA\tT\n" for i in range(p))
    print(
        f"wrote {prefix}.bed ({total / 1e9:.2f} GB payload) + .bim + .fam "
        f"(n={n}, p={p})"
    )


if __name__ == "__main__":
    main()
