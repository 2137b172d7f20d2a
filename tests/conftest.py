import shutil
import tempfile

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("sosse-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        # the suite shares ONE JVM across ~315 tests; ContextCleaner only
        # reclaims unreferenced cache/localCheckpoint/shuffle blocks when
        # a JVM GC runs, and with a big mostly-idle heap that can be
        # never — force a periodic GC so blocks actually free (the
        # default 30min exceeded the suite length and the session died
        # of accumulated blocks at ~250 tests; 1min still showed py4j
        # flakes near the 300-test mark at 8g, hence 30s + 12g)
        .config("spark.cleaner.periodicGC.interval", "30s")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="sosse_spark_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
