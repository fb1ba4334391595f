"""Golden tests for the sequential kernel.

Expectations are data copied from the reference test suite
(/root/reference/tests/test_drain.py, test_template_miner.py,
test_masking.py) so the kernel's semantics are pinned to the reference.
"""

from drain3_spark.config import MaskRule
from drain3_spark.core.extract import ParamExtractor
from drain3_spark.core.kernel import TemplateBank, tokenize
from drain3_spark.core.masking import Masker

SSH_LINES = [
    "Dec 10 07:07:38 LabSZ sshd[24206]: input_userauth_request: invalid user test9 [preauth]",
    "Dec 10 07:08:28 LabSZ sshd[24208]: input_userauth_request: invalid user webmaster [preauth]",
    "Dec 10 09:12:32 LabSZ sshd[24490]: Failed password for invalid user ftpuser from 0.0.0.0 port 62891 ssh2",
    "Dec 10 09:12:35 LabSZ sshd[24492]: Failed password for invalid user pi from 0.0.0.0 port 49289 ssh2",
    "Dec 10 09:12:44 LabSZ sshd[24501]: Failed password for invalid user ftpuser from 0.0.0.0 port 60836 ssh2",
    "Dec 10 07:28:03 LabSZ sshd[24245]: input_userauth_request: invalid user pgadmin [preauth]",
]


def test_tokenize():
    assert tokenize("  a  b\tc ") == ["a", "b", "c"]
    assert tokenize("") == []
    assert tokenize("a_b c", extra_delimiters=["_"]) == ["a", "b", "c"]


def test_shorter_than_depth_message():
    # reference tests/test_drain.py:10-27
    bank = TemplateBank(depth=4)
    assert bank.ingest("hello")["change_type"] == "cluster_created"
    assert bank.ingest("hello")["change_type"] == "none"
    assert bank.ingest("otherword")["change_type"] == "cluster_created"
    assert len(bank.registry) == 2


def test_ssh_corpus_default_sim():
    # reference tests/test_drain.py:29-58 — the reference corpus is built
    # via str.splitlines of an indented triple-quoted string, so it
    # includes a leading "" and a trailing whitespace-only entry; both
    # tokenize to [] and join the token_count=0 cluster (hence the
    # expected total cluster size of 8 for 6 visible lines).
    expected = [
        "",
        "Dec 10 07:07:38 LabSZ sshd[24206]: input_userauth_request: invalid user test9 [preauth]",
        "Dec 10 <*> LabSZ <*> input_userauth_request: invalid user <*> [preauth]",
        "Dec 10 09:12:32 LabSZ sshd[24490]: Failed password for invalid user ftpuser from 0.0.0.0 port 62891 ssh2",
        "Dec 10 <*> LabSZ <*> Failed password for invalid user <*> from 0.0.0.0 port <*> ssh2",
        "Dec 10 <*> LabSZ <*> Failed password for invalid user <*> from 0.0.0.0 port <*> ssh2",
        "Dec 10 <*> LabSZ <*> input_userauth_request: invalid user <*> [preauth]",
        "",
    ]
    bank = TemplateBank()
    got = [bank.ingest(line)["template_mined"] for line in [""] + SSH_LINES + ["  "]]
    assert got == expected
    assert bank.total_assigned() == 8


def test_ssh_corpus_sim_75():
    # reference tests/test_drain.py:60-99
    expected = [
        "",
        "Dec 10 07:07:38 LabSZ sshd[24206]: input_userauth_request: invalid user test9 [preauth]",
        "Dec 10 07:08:28 LabSZ sshd[24208]: input_userauth_request: invalid user webmaster [preauth]",
        "Dec 10 09:12:32 LabSZ sshd[24490]: Failed password for invalid user ftpuser from 0.0.0.0 port 62891 ssh2",
        "Dec 10 <*> LabSZ <*> Failed password for invalid user <*> from 0.0.0.0 port <*> ssh2",
        "Dec 10 <*> LabSZ <*> Failed password for invalid user <*> from 0.0.0.0 port <*> ssh2",
        "Dec 10 07:28:03 LabSZ sshd[24245]: input_userauth_request: invalid user pgadmin [preauth]",
        "",
    ]
    bank = TemplateBank(depth=4, sim_th=0.75, max_children=100)
    got = [bank.ingest(line)["template_mined"] for line in [""] + SSH_LINES + ["  "]]
    assert got == expected
    assert bank.total_assigned() == 8


def test_max_clusters_single():
    # reference tests/test_drain.py:101-136
    bank = TemplateBank(max_clusters=1)
    entries = ["A format 1", "A format 2", "B format 1", "B format 2", "A format 3"]
    expected = ["A format 1", "A format <*>", "B format 1", "B format <*>", "A format 3"]
    got = [bank.ingest(e)["template_mined"] for e in entries]
    assert got == expected
    assert bank.total_assigned() == 1


def test_max_clusters_lru_multiple_leaf_nodes():
    # reference tests/test_drain.py:138-184
    bank = TemplateBank(max_clusters=2, depth=4, param_str="*")
    entries = ["A A A", "A A B", "B A A", "B A B", "C A A", "C A B", "B A A", "A A A"]
    expected = ["A A A", "A A *", "B A A", "B A *", "C A A", "C A *", "B A *", "A A A"]
    got = [bank.ingest(e)["template_mined"] for e in entries]
    assert got == expected
    assert bank.total_assigned() == 4


def test_max_clusters_lru_single_leaf_node():
    # reference tests/test_drain.py:186-231
    bank = TemplateBank(max_clusters=2, depth=4, param_str="*")
    entries = ["A A A", "A A B", "A B A", "A B B", "A C A", "A C B", "A B A", "A A A"]
    expected = ["A A A", "A A *", "A B A", "A B *", "A C A", "A C *", "A B *", "A A A"]
    got = [bank.ingest(e)["template_mined"] for e in entries]
    assert got == expected


def test_match_only():
    # reference tests/test_drain.py:234-258
    bank = TemplateBank()
    for line in ["aa aa aa", "aa aa bb", "aa aa cc", "xx yy zz"]:
        bank.ingest(line)
    assert bank.match("aa aa tt").cid == 1
    assert bank.match("xx yy zz").cid == 2
    assert bank.match("xx yy rr") is None
    assert bank.match("nothing") is None


def test_match_strategies():
    # reference tests/test_template_miner.py:350-383 (drain-level portion)
    bank = TemplateBank()
    for line in ["training4Model start", "loadModel start", "loadModel stop",
                 "this is a test"]:
        bank.ingest(line)
    assert bank.match("loadModel start", "fallback") is not None
    assert bank.match("loadModel start", "always") is not None
    assert bank.match("loadModel start", "never") is None
    bank.ingest("loadModel start")
    assert bank.match("loadModel start", "never") is not None

    bank2 = TemplateBank(parametrize_numeric_tokens=False)
    for line in ["training4Model start", "loadModel start", "loadModel stop",
                 "this is a test"]:
        bank2.ingest(line)
    for strategy in ("never", "always", "fallback"):
        assert bank2.match("loadModel start", strategy) is not None
        assert bank2.match("", strategy) is None
    bank2.ingest("")
    for strategy in ("never", "always", "fallback"):
        assert bank2.match("", strategy) is not None


def test_create_template_merge():
    # reference tests/test_drain.py:260-274
    bank = TemplateBank(param_str="*")
    assert list(bank.merge_template(["aa", "bb", "cc"], ["aa", "bb", "dd"])) == \
        ["aa", "bb", "*"]
    assert list(bank.merge_template(["aa", "bb", "dd"], ["aa", "bb", "dd"])) == \
        ["aa", "bb", "dd"]


def test_state_roundtrip():
    # relational mirror of reference tests/test_template_miner.py:25-61
    for max_clusters in (None, 10):
        bank = TemplateBank(max_clusters=max_clusters)
        for line in ["hello", "hello ABC", "hello BCD", "hello XYZ", "goodbye XYZ"]:
            bank.ingest(line)
        rows = bank.export_state()
        bank2 = TemplateBank.from_state(rows, counter=bank.counter,
                                        max_clusters=max_clusters)
        assert list(bank.registry.keys()) == list(bank2.registry.keys())
        assert [r.template for r in bank.registry.values()] == \
            [r.template for r in bank2.registry.values()]
        # resumed bank keeps mining consistently
        r1 = bank.ingest("hello yyy")
        r2 = bank2.ingest("hello yyy")
        assert r1["template_mined"] == r2["template_mined"]
        assert r1["cluster_id"] == r2["cluster_id"]


def test_masker():
    # reference tests/test_masking.py:31-36
    rule = MaskRule(r"((?<=[^A-Za-z0-9])|^)([\-\+]?\d+)((?=[^A-Za-z0-9])|$)", "NUM")
    masker = Masker([rule], "<!", "!>")
    assert masker.mask("D9 test 999 888 1A ccc 3") == \
        "D9 test <!NUM!> <!NUM!> 1A ccc <!NUM!>"
    # reference tests/test_masking.py:10-29 — grouping by mask name
    rules = [MaskRule("a", "1"), MaskRule("b", "1"), MaskRule("c", "2"),
             MaskRule("d", "3"), MaskRule("x", "s"), MaskRule("y", "s")]
    m = Masker(rules, "", "")
    assert sorted(m.mask_names) == ["1", "2", "3", "s"]
    assert len(m.rules_for("1")) == 2
    assert len(m.rules_for("s")) == 2


def test_extract_parameters_direct():
    # reference tests/test_template_miner.py:98-305 (full 28-vector suite)
    rules = [
        MaskRule(r"hdfs://[\w.:@-]*((/[\w.~%+-]+)+/?)?", "hdfs_uri"),
        MaskRule(r"(?P<quote>[\"'`]).*?(?P=quote)", "quoted_string"),
        MaskRule(r"((?P<p_0>[*_])\2{0,2}).*?\1", "markdown_emph"),
        MaskRule(r"multiple \*word\* pattern", "*words*"),
        MaskRule(r"some \S+ \S+ pattern", "*words*"),
        MaskRule(r"(\d{1,3}\.){3}\d{1,3}", "ip"),
        MaskRule(r"(?P<number>\d+)\.\d+", "float"),
        MaskRule(r"0[xX][a-fA-F0-9]+", "integer"),
        MaskRule(r"(?P<number>\d+)", "integer"),
        MaskRule(r"HelloWorld", "*"),
        MaskRule(r"MaskPrefix", "<"),
    ]
    ex = ParamExtractor(Masker(rules, "<", ">"))
    vectors = [
        ("<hdfs_uri>:<integer>+<integer>",
         "hdfs://msra-sa-41:9000/pageinput2.txt:671088640+134217728",
         ["hdfs://msra-sa-41:9000/pageinput2.txt", "671088640", "134217728"],
         ["hdfs_uri", "integer", "integer"]),
        ("Hello <quoted_string>", "Hello 'World'", ["'World'"], ["quoted_string"]),
        ("<quoted_string><quoted_string>", """'This "should"'`do no breakin'`""",
         ["""'This "should"'""", "`do no breakin'`"],
         ["quoted_string", "quoted_string"]),
        ("This is <markdown_emph> <markdown_emph>!.", "This is ___very___ *important*!.",
         ["___very___", "*important*"], ["markdown_emph", "markdown_emph"]),
        ("<float>.<*>", "0.15.Test", ["0.15", "Test"], ["float", "*"]),
        ("<ip>:<integer>", "192.0.0.1:5000", ["192.0.0.1", "5000"], ["ip", "integer"]),
        ("<ip>:<integer>:<integer>", "192.0.0.1:5000:123",
         ["192.0.0.1", "5000", "123"], ["ip", "integer", "integer"]),
        ("<float>.<*>.<float>", "0.15.Test.0.2",
         ["0.15", "Test", "0.2"], ["float", "*", "float"]),
        ("<float> <float>", "0.15 10.16", ["0.15", "10.16"], ["float", "float"]),
        ("<*words*>@<integer>", "some other cool pattern@0xe1f",
         ["some other cool pattern", "0xe1f"], ["*words*", "integer"]),
        ("Another test with <*words*> that includes <integer><integer> and <integer> <*> <integer>",
         "Another test with some other 0Xadded pattern that includes 500xc0ffee and 0X4 times 5",
         ["some other 0Xadded pattern", "50", "0xc0ffee", "0X4", "times", "5"],
         ["*words*", "integer", "integer", "integer", "*", "integer"]),
        ("some <*words*> <*words*>",
         "some multiple *word* pattern some confusing *word* pattern",
         ["multiple *word* pattern", "some confusing *word* pattern"],
         ["*words*", "*words*"]),
        ("<*words*> <*>", "multiple *word* pattern <*words*>",
         ["multiple *word* pattern", "<*words*>"], ["*words*", "*"]),
        ("<*> <*>", "HelloWorld Test", ["HelloWorld", "Test"], ["*", "*"]),
        ("<*> <*>", "HelloWorld <anything>", ["HelloWorld", "<anything>"], ["*", "*"]),
        ("<*><integer>", "HelloWorld1", ["HelloWorld", "1"], ["*", "integer"]),
        ("<*> works <*>", "This works as-expected", ["This", "as-expected"], ["*", "*"]),
        ("<memory:<integer>>", "<memory:8>", ["8"], ["integer"]),
        ("<memory:<integer> <core:<float>>>", "<memory:8 <core:0.5>>",
         ["8", "0.5"], ["integer", "float"]),
        ("<*> <memory:<<integer> <core:<float>>>", "New: <memory:<8 <core:0.5>>",
         ["New:", "8", "0.5"], ["*", "integer", "float"]),
        ("<<>", "MaskPrefix", ["MaskPrefix"], ["<"]),
        ("<<<>>", "<MaskPrefix>", ["MaskPrefix"], ["<"]),
        ("There are no parameters here.", "There are no parameters here.", [], []),
        ("<float> <float>", "0.15 10.16 3.19", None, None),
        ("<float> <float>", "0.15 10.16 test 3.19", None, None),
        ("<memory:<<integer> <core:<float>>>", "<memory:8 <core:0.5>>", None, None),
        ("<<>", "<<>", None, None),
        ("<*words*> <*words*>", "0.15 0.15", None, None),
    ]
    for template, content, exp_values, exp_names in vectors:
        got = ex.extract(template, content, exact_matching=True)
        if exp_values is None:
            assert got is None, (template, content, got)
        else:
            assert got is not None, (template, content)
            assert [v for v, _ in got] == exp_values, (template, content, got)
            assert [n for _, n in got] == exp_names, (template, content, got)


def test_extract_parameters_mined():
    # reference tests/test_template_miner.py:63-96
    rules = [
        MaskRule(r"((?<=[^A-Za-z0-9])|^)([\-\+]?\d+)((?=[^A-Za-z0-9])|$)", "NUM"),
        MaskRule(r"multiple words", "WORDS"),
    ]
    masker = Masker(rules, "[:", ":]")
    bank = TemplateBank(param_str="[:*:]")
    ex = ParamExtractor(masker)

    def add_and_test(msg, expected, exact=False):
        res = bank.ingest(masker.mask(msg))
        got = ex.extract(res["template_mined"], msg, exact_matching=exact)
        assert got is not None, (msg, res["template_mined"])
        assert [v for v, _ in got] == expected, (msg, res["template_mined"], got)

    add_and_test("hello", [])
    add_and_test("hello ABC", [])
    add_and_test("hello BCD", ["BCD"])
    add_and_test("hello    BCD", ["BCD"])
    add_and_test("hello\tBCD", ["BCD"])
    add_and_test("request took 123 ms", ["123"])
    add_and_test("file saved [test.xml]", [])
    add_and_test("new order received: [:xyz:]", [])
    add_and_test("order type: new, order priority:3", ["3"])
    add_and_test("order type: changed, order priority:5", ["changed,", "5"])
    add_and_test("sometimes one needs multiple words", ["multiple words"], True)
    add_and_test("sometimes one needs not", ["not"], True)
    add_and_test("sometimes one needs multiple words", ["multiple words"], True)


def test_match_with_mask_and_delimiters():
    # reference tests/test_template_miner.py:307-348
    rules = [MaskRule(r"((?<=[^A-Za-z0-9])|^)([\-\+]?\d+)((?=[^A-Za-z0-9])|$)", "NUM")]
    masker = Masker(rules, "<", ">")
    bank = TemplateBank(extra_delimiters=["_"])
    for line in ["aa aa aa", "aa aa bb", "xx yy zz", "rrr qqq 123"]:
        bank.ingest(masker.mask(line))
    def match(s):
        return bank.match(masker.mask(s))
    assert match("aa   aa tt").cid == 1
    assert match("aa aa 12").cid == 1
    assert match("xx yy   zz").cid == 2
    assert match("xx yy rr") is None
    assert match("nothing") is None
    assert match("rrr qqq   456   ").cid == 3
    assert match("rrr qqq 555.2") is None
    assert match("rrr qqq num") is None
