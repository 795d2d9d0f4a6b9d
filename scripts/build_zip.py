#!/usr/bin/env python
"""Build the spark-submit --py-files artifact (north_rule launch
contract):

    python scripts/build_zip.py [out.zip]

Produces a zip whose root contains the ``polyminhash_spark`` package,
suitable for

    spark-submit --py-files polyminhash_spark.zip \\
        polyminhash_spark/cli.py run --input ... --out ...

Deterministic: fixed timestamps, sorted member order — the artifact
hash only changes when the code does.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "polyminhash_spark")


def build(out_path: str) -> str:
    members = []
    for root, _, names in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for name in names:
            if not name.endswith(".py"):
                continue
            full = os.path.join(root, name)
            arc = os.path.relpath(full, REPO)
            members.append((arc, full))
    members.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, full in members:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=(2000, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "polyminhash_spark.zip")
    print(build(out))
