from stream4flow_spark.run import main

raise SystemExit(main())
