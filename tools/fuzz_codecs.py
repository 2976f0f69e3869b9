"""Driver-side codec/hash fuzzer — deeper than the suite's 40-example
hypothesis budget.

The Spark contract under test: every decoder reachable from
``decode_media``'s mapInPandas path raises ONLY ValueError on malformed
input (anything else kills a whole task on one corrupt row), and never
returns fabricated data for bytes it cannot parse. Three attack
surfaces:

1. encode->decode round trips over random rasters/PCM across the full
   parameter grid (subsampling x quality x restart interval) — decoded
   output must be shape/dtype-exact and (for the lossless codecs)
   bit-exact;
2. MUTATIONS of valid containers — bit flips, truncations, splices,
   length-field corruption — must yield ValueError or a clean decode,
   never struct.error/IndexError/KeyError/ZeroDivisionError or a hang.
(The portable-hash-vs-DuckDB invariant needs a Spark session and lives
in tests/test_property.py, not here.)

Usage:  python tools/fuzz_codecs.py [iterations=2000] [seed=0]
Exit 0 = no contract violations. Prints a one-line JSON summary.
"""

from __future__ import annotations

import json
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_rs_spark.operators import jpeg as J
from etl_rs_spark.operators import multimodal as mm

DECODERS = {
    "jpeg": J.decode_jpeg,
    "png": mm.decode_png,
    "ppm": mm.decode_ppm,
    "wav": mm.decode_wav,
}


def _raster(rng: random.Random, max_side: int = 24) -> np.ndarray:
    h, w = rng.randint(1, max_side), rng.randint(1, max_side)
    arr = np.frombuffer(
        rng.randbytes(h * w * 3), dtype=np.uint8
    ).reshape(h, w, 3)
    return arr.copy()


def _valid_payloads(rng: random.Random) -> dict[str, bytes]:
    px = _raster(rng)
    quality = rng.choice([1, 35, 75, 90, 100])
    sub = rng.choice(["444", "420"])
    ri = rng.choice([0, 0, 1, 3])
    pcm = np.frombuffer(rng.randbytes(2 * rng.randint(1, 400)), dtype=np.int16)
    return {
        "jpeg": J.encode_jpeg(px, quality=quality, subsampling=sub, restart_interval=ri),
        "png": mm.encode_png(px),
        "ppm": mm.encode_ppm(px),
        "wav": mm.encode_wav(pcm.astype(np.int16), sample_rate=rng.choice([8000, 44100])),
    }


def _mutate(rng: random.Random, payload: bytes) -> bytes:
    b = bytearray(payload)
    kind = rng.randrange(5)
    if kind == 0 and b:  # bit flips
        for _ in range(rng.randint(1, 8)):
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
    elif kind == 1:  # truncate
        b = b[: rng.randrange(len(b) + 1)]
    elif kind == 2:  # splice a random window from elsewhere
        i = rng.randrange(max(len(b), 1))
        b[i : i + rng.randint(1, 16)] = rng.randbytes(rng.randint(0, 16))
    elif kind == 3 and len(b) >= 4:  # corrupt a plausible length field
        i = rng.randrange(len(b) - 2)
        b[i : i + 2] = rng.randbytes(2)
    else:  # append garbage
        b += rng.randbytes(rng.randint(1, 32))
    return bytes(b)


def main(iterations: int = 2000, seed: int = 0) -> int:
    rng = random.Random(seed)
    stats = {"round_trips": 0, "mutations": 0, "clean_decodes_of_mutants": 0}
    violations: list[str] = []

    for it in range(iterations):
        payloads = _valid_payloads(rng)

        # 1. round trips (lossless exact; jpeg bounded at q100 handled
        # by the hypothesis suite — here just no-crash + shape)
        px_ref = mm.decode_png(payloads["png"])
        assert mm.decode_ppm(payloads["ppm"]).shape == px_ref.shape
        out = J.decode_jpeg(payloads["jpeg"])
        assert out.dtype == np.uint8 and out.shape == px_ref.shape
        stats["round_trips"] += 1

        # 2. mutations: ValueError or clean success, nothing else
        for name, decoder in DECODERS.items():
            mutant = _mutate(rng, payloads[name])
            stats["mutations"] += 1
            try:
                r = decoder(mutant)
                # a decode that "succeeds" must still produce sane output:
                # images are (h, w, ch>=3) uint8 with positive dims; wav is
                # a 1-D sample array (possibly empty: a zero-sample data
                # chunk is a legal container)
                arr = r[0] if isinstance(r, tuple) else r
                sane = isinstance(arr, np.ndarray) and (
                    (name == "wav" and arr.ndim == 1)
                    or (name != "wav" and arr.ndim == 3 and arr.dtype == np.uint8
                        and arr.shape[0] > 0 and arr.shape[1] > 0
                        and arr.shape[2] >= 3)
                )
                if not sane:
                    violations.append(
                        f"{name}: insane success at iter {it}: "
                        f"{type(arr).__name__} shape={getattr(arr, 'shape', None)}"
                    )
                stats["clean_decodes_of_mutants"] += 1
            except ValueError:
                pass
            except Exception as e:  # noqa: BLE001 — the contract under test
                violations.append(
                    f"{name}: {type(e).__name__} leaked at iter {it}: {e} "
                    f"(payload {mutant[:40].hex()}...)"
                )

    print(json.dumps({"iterations": iterations, **stats,
                      "violations": violations[:10],
                      "n_violations": len(violations)}))
    return 1 if violations else 0


if __name__ == "__main__":
    its = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    sd = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sys.exit(main(its, sd))
