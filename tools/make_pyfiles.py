"""Package panako_spark as a --py-files zip (north rule: ships as
spark-submit --py-files). Usage: python tools/make_pyfiles.py"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "dist", "panako_spark.zip")


def member_files(repo: str = REPO) -> list[str]:
    """Sorted repo-relative paths of every package .py file."""
    pkg = os.path.join(repo, "panako_spark")
    out = []
    for root, _dirs, files in os.walk(pkg):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                out.append(os.path.relpath(os.path.join(root, f), repo))
    return sorted(out)


def build(out: str = OUT) -> str:
    # Deterministic archive (sorted members, fixed timestamps) so the
    # checked-in zip only diffs when package CONTENT changes, and a
    # byte-compare against a fresh build is a valid staleness check.
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for rel in member_files():
            with open(os.path.join(REPO, rel), "rb") as f:
                info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_DEFLATED
                info.external_attr = 0o644 << 16
                z.writestr(info, f.read())
    return out


def main() -> None:
    out = build()
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
