from prometheus_remote_kinesis_spark.cli import main

raise SystemExit(main())
