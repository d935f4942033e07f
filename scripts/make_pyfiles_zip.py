"""Build the --py-files zip of xarray_spatial_spark.

Usage: python scripts/make_pyfiles_zip.py [/tmp/xss_pyfiles.zip]
"""

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/xss_pyfiles.zip")
    pkg = ROOT / "xarray_spatial_spark"
    with zipfile.ZipFile(out, "w") as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, Path("xarray_spatial_spark") / p.relative_to(pkg))
    print(out)


if __name__ == "__main__":
    main()
