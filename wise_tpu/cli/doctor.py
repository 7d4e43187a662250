"""doctor CLI: environment / deployment diagnostics.

    python -m wise_tpu.cli.doctor [--project-dir P]

Checks the native decoder, accelerator devices, sqlite FTS5, and (optionally)
a project's assets, printing one PASS/FAIL line per check.
"""

from __future__ import annotations

import argparse
import sys


def check(name, fn):
    try:
        detail = fn()
        print(f"PASS  {name}{': ' + str(detail) if detail else ''}")
        return True
    except Exception as e:
        print(f"FAIL  {name}: {type(e).__name__}: {e}")
        return False


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="doctor", description=__doc__)
    p.add_argument("--project-dir", default=None)
    args = p.parse_args(argv)
    ok = True

    def native():
        from ..io import native_decoder

        if not native_decoder.available():
            raise RuntimeError("libwisedecoder.so missing and build failed")
        lib = native_decoder.get_lib()
        lib.wise_decoder_version.restype = __import__("ctypes").c_char_p
        return lib.wise_decoder_version().decode()

    ok &= check("native FFmpeg decoder", native)

    def devices():
        import jax

        devs = jax.devices()
        return f"{len(devs)} x {devs[0].platform}" if devs else "none"

    ok &= check("jax devices", devices)

    def device_compute():
        import jax.numpy as jnp
        import numpy as np

        r = float(jnp.ones((128, 128)).sum())
        assert r == 128 * 128
        return "matmul ok"

    ok &= check("device compute", device_compute)

    def fts5():
        import sqlite3

        conn = sqlite3.connect(":memory:")
        conn.execute("CREATE VIRTUAL TABLE t USING fts5(a)")
        return "sqlite FTS5 available"

    ok &= check("sqlite FTS5", fts5)

    def opencv():
        import cv2

        return f"OpenCV {cv2.__version__}"

    ok &= check("opencv", opencv)

    if args.project_dir:
        def project():
            from ..project import WiseProject

            proj = WiseProject(args.project_dir)
            assets = proj.discover_assets()
            n = sum(
                len(v) for k, v in assets.items() if k != "metadata"
            )
            return f"{n} feature assets, {len(assets['metadata'])} metadata tables"

        ok &= check("project assets", project)

        def db():
            from .. import db as wdb
            from ..db.repository import get_counts
            from ..project import WiseProject

            proj = WiseProject(args.project_dir)
            conn = wdb.connect(proj.db_path, readonly=True)
            return get_counts(conn)

        ok &= check("project db", db)

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
