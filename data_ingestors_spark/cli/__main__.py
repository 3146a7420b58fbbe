import sys

from data_ingestors_spark.cli.frontend import main

sys.exit(main())
