"""spark-submit entry script — delegates to gbif_data_validator_spark.cli.

Usage:
    spark-submit --py-files gdv.zip scripts/run_validation.py --table <ref> ...
"""

import sys

from gbif_data_validator_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
