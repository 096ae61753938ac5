from pyspark_pipeline_framework_spark.cli import main

raise SystemExit(main())
