#!/bin/sh
# Package the engine for spark-submit --py-files (north_rule launch mode):
#   sh scripts/make_pyfiles.sh
#   spark-submit --py-files dist/geotile.zip scripts/submit_pipeline.py --n 1000000000
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/geotile.zip
python -c "
import zipfile, pathlib
with zipfile.ZipFile('dist/geotile.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for p in sorted(pathlib.Path('geotile').rglob('*.py')):
        z.write(p, p.as_posix())
print('dist/geotile.zip written')
"
