from end_to_end_etl_pipeline_spark.cli import main

raise SystemExit(main())
