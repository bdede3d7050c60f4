"""--py-files ship-shape: the package must be importable from the zip
artifact alone (zip-safe: no __file__-relative data access at import)."""

import subprocess
import sys


def test_package_imports_from_zip(tmp_path):
    from scripts.make_pyfiles import build

    zip_path = build(str(tmp_path / "kms.zip"))
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]);\n"
        "import kernel_memory_spark.schema\n"
        "import kernel_memory_spark.operators.dedup\n"
        "import kernel_memory_spark.operators.search_service\n"
        "import kernel_memory_spark.functions.chunker as c\n"
        "import kernel_memory_spark.streaming.pipeline\n"
        "import kernel_memory_spark.plans.ast\n"
        "assert c.__file__.startswith(sys.argv[1]), c.__file__\n"
        "print('ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, zip_path],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip().endswith("ok")
