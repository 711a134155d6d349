"""``python -m knowledge_graph_spark`` → the kgs CLI (gkg/src/main.rs)."""

from knowledge_graph_spark.cli import main

raise SystemExit(main())
