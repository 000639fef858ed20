"""Benchmark CLI: thin wrapper over the repo-root bench harness."""

from __future__ import annotations


def main(argv=None):
    import importlib.util
    from pathlib import Path

    root = Path(__file__).resolve().parents[2] / "bench.py"
    spec = importlib.util.spec_from_file_location("gqe_bench", root)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
