from robosuite_tpu.utils.usd.exporter import USDExporter  # noqa: F401
