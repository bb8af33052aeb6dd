#!/bin/sh
# Build the --py-files zip for spark-submit.
set -e
cd "$(dirname "$0")/.."
rm -f lnex_spark.zip
python3 -c "
import zipfile, pathlib
z = zipfile.ZipFile('lnex_spark.zip', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('lnex_spark').rglob('*.py')):
    z.write(p, str(p))
z.close()
print('wrote lnex_spark.zip')
"
