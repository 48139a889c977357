"""Rule suggestion (RuleSuggestion/Detectors/RuleDetectors.cs analog):
profile → draft rules with confidence + rationale."""

from fhir_data_validation_spark import RuleSet
from fhir_data_validation_spark.suggestions import suggest_rules


def test_detectors_over_synthetic_profile(spark):
    rows = [(f"doc-{i:04d}",                       # id-grammar unique key
             "fhir",                                # constant
             ["a", "b", "c"][i % 3],                # small closed set
             float(10 + i % 50),                    # numeric envelope
             f"2024-01-{(i % 28) + 1:02d}",         # ISO dates
             None if i % 4 == 0 else "x",           # nullable
             [1, 2, 3][i % 3])                      # numeric closed set
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "key string, const string, cat string, score double, "
              "day string, sparse string, status int")
    sugg = suggest_rules(df, min_samples=20)
    by = {}
    for s in sugg:
        by.setdefault((s["detector"], s["rule"]["column"]), s)

    assert ("FixedValueDetector", "const") in by
    assert by[("FixedValueDetector", "const")]["rule"]["params"] == \
        {"value": "fhir"}
    assert ("AllowedValuesDetector", "cat") in by
    assert sorted(by[("AllowedValuesDetector", "cat")]
                  ["rule"]["params"]["values"]) == ["a", "b", "c"]
    # numeric closed sets keep NATIVE-typed values (a stringified set
    # would fail the type-family compile check)
    assert by[("AllowedValuesDetector", "status")]["rule"]["params"] == \
        {"values": [1, 2, 3]}
    assert ("UniqueDetector", "key") in by
    assert ("RegexDetector", "key") in by      # id grammar
    assert ("RegexDetector", "day") in by      # isoDate beats id grammar
    assert "isoDate" in by[("RegexDetector", "day")]["rule"]["id"]
    rng = by[("RangeDetector", "score")]["rule"]["params"]
    assert rng == {"min": 10.0, "max": 59.0}
    # nullable column gets no Required suggestion; full columns do
    req_cols = {s["rule"]["column"] for s in sugg
                if s["detector"] == "RequiredDetector"}
    assert "sparse" not in req_cols and "key" in req_cols
    # every suggested rule parses and compiles against the schema
    from fhir_data_validation_spark import EngineConfig, compile_ruleset
    rs = RuleSet.parse({"rules": [s["rule"] for s in sugg]})
    plan = compile_ruleset(rs, df.schema,
                           EngineConfig(key_col="key", group_col="cat"))
    assert len(plan.rule_ids) == len(sugg)
    # confidence/rationale ride every suggestion (the reference's
    # SystemRuleSuggestion contract)
    assert all(0 < s["confidence"] <= 1 and s["rationale"] for s in sugg)


def test_min_samples_gate(spark):
    df = spark.createDataFrame([("a", 1)] * 5, "c string, v int")
    assert suggest_rules(df, min_samples=20) == []
