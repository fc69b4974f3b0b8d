"""spark-submit primary resource that drives the engine CLI on a
cluster (spark-submit cannot run `python -m pkg.module`, so this
wrapper is the documented way to submit the CLI):

    spark-submit --py-files dist/ckanext_extractor_spark.zip \
        tools/submit_cli.py build --source ... --index ...
"""

import sys

from ckanext_extractor_spark.cli.main import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
