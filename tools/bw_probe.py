"""Host health probe gating performance measurements.

This sandbox's dominant noise mode (BENCH/BASELINE.md, round 5-6
records) is a VM-neighbor MEMORY-BANDWIDTH collapse: a large numpy copy
drops from multi-GB/s to 0.02-0.14 GB/s for minutes-to-hours while
single-thread CPU (sha256) stays full speed. Spark wall times measured
inside such a window are 2-6x inflated and NOT code-comparable.

Prints one JSON line: {"copy_gbps": ..., "sha256_mbps": ..., "ok": bool}
ok = copy_gbps >= BW_OK_GBPS (default 1.0). Run before recording any
bench/scaling number; only record when ok (or disclose the probe value
alongside the measurement).
"""

from __future__ import annotations

import hashlib
import json
import os
import time


def main() -> None:
    import numpy as np

    a = np.zeros(50_000_000, dtype=np.int64)  # 0.4 GB
    t0 = time.monotonic()
    a.copy()
    copy_gbps = 0.4 / (time.monotonic() - t0)

    buf = bytes(50_000_000)
    t0 = time.monotonic()
    hashlib.sha256(buf).hexdigest()
    sha_mbps = 50.0 / (time.monotonic() - t0)

    ok = copy_gbps >= float(os.environ.get("BW_OK_GBPS", "1.0"))
    print(
        json.dumps(
            {
                "copy_gbps": round(copy_gbps, 3),
                "sha256_mbps": round(sha_mbps, 1),
                "ok": ok,
            }
        )
    )


if __name__ == "__main__":
    main()
