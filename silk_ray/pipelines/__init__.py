"""Query pipelines over the driver testdata + flagship rule specs."""
