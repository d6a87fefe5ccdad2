import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from sits_classification_ray.sources.synth import synth_crawl_arrays


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import sits_classification_ray as scr

    scr.tune_for_cluster()
    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def crawl_table() -> pa.Table:
    return synth_crawl_arrays(n_urls=40, mean_snaps=30, seed=7)


@pytest.fixture(scope="session")
def crawl_pdf(crawl_table) -> pd.DataFrame:
    return crawl_table.to_pandas()


@pytest.fixture()
def crawl_ds(crawl_table) -> rd.Dataset:
    return rd.from_arrow(crawl_table)


def sorted_pdf(df: pd.DataFrame, cols=None) -> pd.DataFrame:
    cols = cols or list(df.columns)
    return (df[sorted(df.columns)]
            .sort_values(sorted(df.columns), kind="mergesort")
            .reset_index(drop=True))
