from csvb_spark.plans.pretty import pretty_format, render_df  # noqa: F401
