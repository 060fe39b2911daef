from csvb_spark.server.pgwire import PgWireServer, serve_forever  # noqa: F401
