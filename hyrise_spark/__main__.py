"""`python -m hyrise_spark` — launch the interactive console (the
hyriseConsole analog; `-m hyrise_spark.pgwire` (psql-compatible),
`-m hyrise_spark.server` (line-JSON) and `-m hyrise_spark.benchmark_runner`
are the other entry points)."""
from hyrise_spark.console import main

raise SystemExit(main())
