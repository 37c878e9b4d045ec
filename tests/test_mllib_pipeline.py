"""MLlib pipeline face tests (O38/O40/O6 on pyspark.ml)."""

import numpy as np

from gordo_components_spark.ml.islands import machine_features
from gordo_components_spark.ml.mllib_pipeline import fit_and_score, save_load_roundtrip


def test_mllib_fit_score_persist(spark, sf_dir, tmp_path):
    feats = machine_features(spark, sf_dir)
    model, scored = fit_and_score(feats, k=2)
    pdf = scored.toPandas()
    assert len(pdf) == feats.count()
    assert (pdf["recon_error"] >= 0).all()
    assert pdf["recon_error"].max() > 0  # k=2 of 4 features → nonzero residual

    loaded = save_load_roundtrip(model, str(tmp_path / "pm"))
    # loaded model reproduces the PCA outputs exactly
    a = model.transform(feats).select("pca").toPandas()
    b = loaded.transform(feats).select("pca").toPandas()
    for va, vb in zip(a["pca"], b["pca"]):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_glm_matches_closed_form_ols(spark, sf_dir):
    # the distributed normal-equations GLM must match numpy's closed-form
    # OLS on the same (x, y) pairs
    import numpy as np

    from pyspark.sql import functions as F

    from gordo_components_spark.registry import load_all
    from gordo_components_spark.sources.tables import load_table

    card = load_all()["ml_train_glm"].fn(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.groupBy("user_id", F.window("ts", "1 day").start.alias("bucket"))
        .agg(
            F.avg(F.when(F.col("event_type") == "error", F.col("value"))).alias("x"),
            F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))).alias("y"),
        )
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
        .collect()
    )
    x = np.array([r.x for r in b])
    y = np.array([r.y for r in b])
    A = np.stack([x, np.ones_like(x)], axis=1)
    (coef, intercept), *_ = np.linalg.lstsq(A, y, rcond=None)
    assert card.n == len(x)
    assert abs(card.coef_x - coef) < 1e-6
    assert abs(card.intercept - intercept) < 1e-6
    resid = y - (coef * x + intercept)
    assert abs(card.rmse - float(np.sqrt(np.mean(resid**2)))) < 1e-6
