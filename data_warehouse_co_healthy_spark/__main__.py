"""``python -m data_warehouse_co_healthy_spark [output_dir]`` — the
user-facing equivalent of the reference's ``process.py`` (which imports
the four pipeline modules and runs them back to back,
``/root/reference/process.py:1-11``): build all 11 dimensions + 4 facts
and write them as parquet. Thin wrapper over ``pipelines.runner.run_all``
via ``tools/run_demo.py`` so the CLI, the demo script, and the tests all
execute the same code path.

Run from the repo root (the package is not pip-installed in this
sandbox, so ``-m`` resolves it via the working directory — which also
puts ``tools/`` on sys.path).
"""

from __future__ import annotations

from tools.run_demo import main

if __name__ == "__main__":
    main()
