import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from dataflow_spark.session import get_spark

    s = get_spark("pytest", cores=int(os.environ.get("DFS_TEST_CORES", "8")))
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    """Dirty synthetic transcripts, the shared parity corpus."""
    import numpy as np

    from dataflow_spark.datagen import make_transcripts

    pdf = make_transcripts(1500, seed=42).sort_values(["conv_id", "turn_idx"]).reset_index(
        drop=True
    )
    pdf["rid"] = np.arange(len(pdf), dtype="int64")
    return pdf


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_pdf):
    return spark.createDataFrame(corpus_pdf).cache()
