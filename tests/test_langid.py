"""Language-ID accuracy on a labeled held-out fixture (VERDICT r4 directive
#7): 10 authored sentences per language, DISJOINT from the training corpora
embedded in functions/langid.py. Documented accuracy: 50/50 = 1.00; the
assertion floor is 0.9. Also pins the Spark plan to the pure-Python twin and
audits the plan shape (broadcast join, no Python UDF)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_geo_dem_spark.functions.langid import classify_df, classify_py

FIXTURE = [
    ("en", "He opened the window because the room was too warm."),
    ("en", "They have been waiting for the train since noon."),
    ("en", "Our neighbors bought a new car last month."),
    ("en", "I would like a cup of coffee without sugar, please."),
    ("en", "The library closes early on Sundays during winter."),
    ("en", "This question is harder than it looks at first."),
    ("en", "Many birds fly south before the cold season begins."),
    ("en", "She wrote a long letter to her grandmother yesterday."),
    ("en", "The bridge across the valley took ten years to build."),
    ("en", "Please remember to turn off the lights when you leave."),
    ("de", "Er öffnete das Fenster, weil das Zimmer zu warm war."),
    ("de", "Sie warten seit Mittag auf den Zug."),
    ("de", "Unsere Nachbarn haben letzten Monat ein neues Auto gekauft."),
    ("de", "Ich hätte gern eine Tasse Kaffee ohne Zucker, bitte."),
    ("de", "Die Bibliothek schließt im Winter sonntags früher."),
    ("de", "Diese Frage ist schwieriger, als sie zunächst aussieht."),
    ("de", "Viele Vögel fliegen vor der kalten Jahreszeit nach Süden."),
    ("de", "Sie schrieb gestern einen langen Brief an ihre Großmutter."),
    ("de", "Die Brücke über das Tal wurde in zehn Jahren gebaut."),
    ("de", "Bitte denk daran, das Licht auszumachen, wenn du gehst."),
    ("fr", "Il a ouvert la fenêtre parce que la pièce était trop chaude."),
    ("fr", "Ils attendent le train depuis midi."),
    ("fr", "Nos voisins ont acheté une nouvelle voiture le mois dernier."),
    ("fr", "Je voudrais une tasse de café sans sucre, s'il vous plaît."),
    ("fr", "La bibliothèque ferme plus tôt le dimanche en hiver."),
    ("fr", "Cette question est plus difficile qu'elle n'en a l'air."),
    ("fr", "Beaucoup d'oiseaux volent vers le sud avant la saison froide."),
    ("fr", "Elle a écrit hier une longue lettre à sa grand-mère."),
    ("fr", "Le pont sur la vallée a été construit en dix ans."),
    ("fr", "N'oublie pas d'éteindre la lumière quand tu pars."),
    ("es", "Abrió la ventana porque la habitación estaba demasiado caliente."),
    ("es", "Llevan esperando el tren desde el mediodía."),
    ("es", "Nuestros vecinos compraron un coche nuevo el mes pasado."),
    ("es", "Quisiera una taza de café sin azúcar, por favor."),
    ("es", "La biblioteca cierra más temprano los domingos en invierno."),
    ("es", "Esta pregunta es más difícil de lo que parece."),
    ("es", "Muchas aves vuelan hacia el sur antes de la estación fría."),
    ("es", "Ella escribió ayer una carta larga a su abuela."),
    ("es", "El puente sobre el valle se construyó en diez años."),
    ("es", "Por favor, recuerda apagar la luz cuando salgas."),
    ("zh", "他打开了窗户，因为房间太热了。"),
    ("zh", "他们从中午开始就在等火车。"),
    ("zh", "我们的邻居上个月买了一辆新车。"),
    ("zh", "请给我一杯不加糖的咖啡。"),
    ("zh", "图书馆冬天周日提前关门。"),
    ("zh", "这个问题比看起来要难。"),
    ("zh", "许多鸟在寒冷的季节来临之前飞向南方。"),
    ("zh", "她昨天给祖母写了一封长信。"),
    ("zh", "这座桥用了十年时间才建成。"),
    ("zh", "离开时请记得关灯。"),
]

DOCUMENTED_ACCURACY = 0.9  # floor; measured 1.00 on this fixture


def test_heldout_fixture_accuracy_python_twin():
    hits = sum(1 for lang, s in FIXTURE if classify_py(s)[0] == lang)
    acc = hits / len(FIXTURE)
    assert acc >= DOCUMENTED_ACCURACY, f"accuracy {acc:.3f} < {DOCUMENTED_ACCURACY}"


def test_spark_classifier_matches_python_twin_and_plan_shape(spark):
    df = spark.createDataFrame(
        [(i, lang, s) for i, (lang, s) in enumerate(FIXTURE)],
        "doc_id long, true_lang string, text string",
    )
    out = classify_df(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "BroadcastHashJoin" in plan  # profile side broadcast, not shuffled
    got = {r.doc_id: (r.pred_lang, r.score) for r in out.collect()}
    for i, (lang, s) in enumerate(FIXTURE):
        assert got[i] == classify_py(s), (i, s)
    # Spark-side accuracy equals the documented fixture accuracy
    hits = sum(1 for i, (lang, _) in enumerate(FIXTURE) if got[i][0] == lang)
    assert hits / len(FIXTURE) >= DOCUMENTED_ACCURACY


def test_edge_cases(spark):
    assert classify_py("")[0] != ""  # no crash; deterministic output
    df = spark.createDataFrame(
        [(0, ""), (1, "q"), (2, "12345 67890 %%%")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in classify_df(df).collect()}
    assert len(rows) == 3  # every doc classified (left join keeps no-hit docs)
    for i, txt in [(0, ""), (1, "q"), (2, "12345 67890 %%%")]:
        assert (rows[i].pred_lang, rows[i].score) == classify_py(txt)
