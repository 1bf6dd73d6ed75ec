from web_content_extraction_benchmark_spark.extractors.ensemble import (
    extract_ensemble_majority,
    majority_vote,
    normalize_answer,
)

HTML = (
    "<body><nav><a>Home</a> <a>About</a></nav>"
    "<p>t1 t2 t3 t4 t5 t6 t7 t8 t9 t10</p>"
    "<footer>foot note</footer></body>"
)
MAIN = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"


def test_majority_keeps_agreed_tokens():
    answers = {"a": MAIN, "b": MAIN, "c": "Home About"}
    # threshold int(3*0.66) = 1 -> everything with >=1 vote survives;
    # force a harder threshold to check the vote logic
    out = majority_vote("Home About " + MAIN + " foot note", answers,
                        vote_threshold=2)
    assert out == MAIN


def test_weighted_vote():
    answers = {"a": MAIN, "b": "Home About"}
    out = majority_vote("Home About " + MAIN, answers,
                        weights={"a": 2, "b": 1}, vote_threshold=2)
    assert out == MAIN


def test_unanimous_disagreement_empty():
    answers = {"a": "x y z", "b": "q r s"}
    assert majority_vote(MAIN, answers, vote_threshold=2) == ""


def test_extract_ensemble_majority_end_to_end():
    answers = {"m1": MAIN, "m2": MAIN, "m3": MAIN}
    out = extract_ensemble_majority(HTML, answers)
    assert MAIN in out
    assert "Home" not in out


def test_normalize_answer():
    assert normalize_answer("  a\n b\tc ") == "a b c"
    assert normalize_answer("") == ""
