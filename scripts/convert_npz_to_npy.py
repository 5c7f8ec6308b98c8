#!/usr/bin/env python3
"""Convert packed .npz datasets into raw .npy arrays for true O(1)
memory-mapping (reference convert_npz_to_npy.py).

PackedDataset(use_mmap=True) prefers ``<stem>_X.npy`` / ``<stem>_Y.npy``
(+``_lengths``) sidecars and mmaps them instead of decompressing the .npz.
"""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from scripts._shared import REPO_ROOT  # noqa: F401, E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("npz", nargs="+", help="packed .npz files to convert")
    args = ap.parse_args(argv)

    import numpy as np

    written = []
    for path in args.npz:
        path = Path(path)
        with np.load(path) as z:
            for key in z.files:
                out = path.with_name(f"{path.stem}_{key}.npy")
                np.save(out, np.ascontiguousarray(z[key]))
                written.append(str(out))
    print(json.dumps({"written": written}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
