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
