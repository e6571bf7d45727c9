"""Operator unit tests on adversarial strings (SURVEY.md §5.2 item 1).

Width boundaries 0x20/0x21/0x7E/0xFF01/0xFF5E/0x3000, PUA sentinels, dash
classes, 特表 exclusion, nr-vs-snr boundary cases, edge blank-line accounting.
"""

from patent_decision_document_converter_spark.functions import parex, spans, trie, widths
from patent_decision_document_converter_spark.functions.jsstr import js_trim
from patent_decision_document_converter_spark.operators import blocks, lawnum, mainstage, strip_blank
from patent_decision_document_converter_spark.operators.text_transformer import TextTransformer


class TestWidths:
    def test_nl(self):
        assert widths.nl("a\r\nb\rc\nd") == "a\nb\nc\nd"
        assert widths.nl("") == ""

    def test_hw_boundaries(self):
        assert widths.hw("！～　ＡＺ０９") == "!~ AZ09"
        # NFKC side effects included (㈱ etc.)
        assert widths.hw("㈱") == "(株)"

    def test_fw_rehalves_seven(self):
        # fw() full-widths ASCII then re-halves －＜＞［］／　 — including
        # pre-existing full-width ones (textUtilsStd.js:369-377)
        assert widths.fw("a-b<c>[d]/ e") == "ａ-ｂ<ｃ>[ｄ]/ ｅ"
        assert widths.fw("－＜＞［］／　") == "-<>[]/ "

    def test_fw_num_only(self):
        assert widths.fw_num("a1Ｂ2") == "a１Ｂ２"
        assert widths.hw_num("１a２Ｂ") == "1a2Ｂ"

    def test_sym_maps(self):
        assert widths.fw_sym("a!b?") == "a！b？"
        assert widths.hw_sym("！ａ？") == "!ａ?"

    def test_clean(self):
        assert widths.clean("a\tb\x0bc\x0cd") == "a b c d"
        assert widths.clean("a\x00b\x7fc\nd") == "abc\nd"
        assert widths.clean("zero​width­x") == "zerowidthx"  # Cf removed

    def test_rm_blank(self):
        assert widths.rm_blank("a\n \t　\nb\n\n") == "a\nb"

    def test_squeeze_ascii_only(self):
        assert widths.squeeze("a  b　　c") == "a b　　c"

    def test_trim_js_semantics(self):
        # JS trim strips ideographic space AND U+FEFF
        assert widths.trim("　a　\n﻿b") == "a\nb"

    def test_gap_edge_accounting(self):
        assert widths.gap("a\nb") == "a\n\nb\n"
        assert widths.gap("a") == "a\n"

    def test_lead_idempotent(self):
        assert widths.lead("x") == "\nx"
        assert widths.lead("\nx") == "\nx"
        assert widths.lead("") == ""

    def test_pad_left_zero_pads_ideographic_space(self):
        # bug-as-spec: pads with U+3000, not '0' (textUtilsMain.js:81-84)
        assert widths.pad_left_zero("3", 2) == "　3"
        assert widths.pad_left_zero("12", 2) == "12"
        assert widths.pad_left_zero("-3", 3) == "-　　3"


class TestMainstage:
    def test_pad_head_skips_empty(self):
        assert mainstage.pad_head("a\n\nb") == "　a\n\n　b"

    def test_trim_head_dot(self):
        assert mainstage.trim_head(" ・x") == "・x"
        assert mainstage.trim_head("  ・x") == "  ・x"  # 2+ spaces: untouched

    def test_trim_head_all(self):
        assert mainstage.trim_head(" 　\tx", "all") == "x"

    def test_tight_below_bullet(self):
        assert mainstage.tight_below_bullet("・a\n\nb") == "・a\nb"
        assert mainstage.tight_below_bullet("●a\n\nb") == "●a\n\nb"  # ● excluded from tight

    def test_fw_head_mark_only(self):
        out = mainstage.fw_head("(1)テスト t")
        assert out.startswith("(１)")  # fwAlnum on the mark: digits only
        assert out.endswith("テスト t")  # suffix untouched

    def test_fw_head_black_dot_whole_line(self):
        assert mainstage.fw_head("●abc 1") == "●ａｂｃ １"  # fw re-halves space


class TestLawnum:
    def test_cascade_order(self):
        assert lawnum.fw_num_law("特許法第29条第2項") == "特許法第２９条第２項"
        assert lawnum.fw_num_law("第17条の2第4項") == "第１７条の２第４項"
        assert lawnum.fw_num_law("PCT第3条") == "ＰＣＴ第３条"

    def test_reiwa_padding(self):
        # 令和2年 -> zero-"padded" with U+3000 then fwNum
        assert lawnum.fw_num_law("令和2年3月12日") == "令和　２年　３月１２日"

    def test_repkw(self):
        assert lawnum.fw_num_law("引用文献1-3及び5") == "引用文献１-３及び５"
        assert lawnum.fw_num_law("段落[0001]、[0003]-[0008]") == "段落[０００１]、[０００３]-[０００８]"

    def test_fw_ref_law_tokutable_exclusion(self):
        assert lawnum.fw_ref_law("表5b") == "表５ｂ"
        assert lawnum.fw_ref_law("特表2020-1号") == "特表2020-1号"

    def test_alpha_case_protection(self):
        out = lawnum.alpha_case("the ieee 802.11 and wifi use wpa2-psk")
        assert "802.11" in out
        assert "wpa2-psk" in out.lower()
        assert out.startswith("The")

    def test_protect_restore_roundtrip(self):
        t, m = lawnum.protect_by_regex_list("IEEE 802.11ax ok", lawnum.DEFAULT_KEEP_TECH_RE_LIST)
        assert "802" not in t
        assert lawnum.restore_protected(t, m) == "IEEE 802.11ax ok"


class TestTrie:
    def test_longest_match(self):
        assert trie.apply_flexible_map("rrc setup request") == "RRC Setup Request"
        assert trie.apply_flexible_map("rrc setup") == "RRC Setup"

    def test_boundary_sensitive_nr(self):
        assert trie.apply_flexible_map("snr") == "SNR"
        assert trie.apply_flexible_map("nr") == "NR"
        assert trie.apply_flexible_map("xnr") == "Xnr"  # xn->Xn wins, nr blocked

    def test_conditional_short_no_sep(self):
        assert trie.apply_flexible_map("H O") == "H O"  # no HO across space
        assert trie.apply_flexible_map("ho") == "HO"
        assert trie.apply_flexible_map("R-A") == "R-A"

    def test_separator_flex(self):
        assert trie.apply_flexible_map("nb-iot") == "NB-IoT"
        assert trie.apply_flexible_map("nb iot") == "NB-IoT"
        assert trie.apply_flexible_map("nbiot") == "NB-IoT"


class TestStripBlank:
    def test_variants(self):
        s = "<付記>\n\nx\n\n　この付記は、拒絶理由を構成するものではありません。"
        out = strip_blank.strip_blank_lines_in_appendix(s)
        assert out == "<付記>\nx\n　この付記は、拒絶理由を構成するものではありません。"

    def test_tight_claims(self):
        assert strip_blank.tight_claims("『a\n\nb』") == "『a\nb』"


class TestParex:
    def test_reference_example(self):
        s = "UEは、DCIを受信し（段落[００２７]、[００６５]、[００９８]-[００９９]、図１、６-８）..."
        out = parex.extract_paragraph_and_figure_refs(s)
        assert out == "(段落[００２７]、[００６５]、[００９８]-[００９９]、図１、６-８)"

    def test_dash_zoo(self):
        for dash in "‐‑‒–—−－〜～":
            out = parex.extract_paragraph_and_figure_refs(f"[0001]{dash}[0003]")
            assert out == "(段落[０００１]-[０００３])", (dash, out)

    def test_padding_width(self):
        assert parex.extract_paragraph_and_figure_refs("[27]") == "(段落[００２７])"
        assert parex.extract_paragraph_and_figure_refs("[00027]") == "(段落[０００２７])"


class TestSpans:
    def test_jp_heading_levels(self):
        nodes = spans.classify_spans("【発明の詳細な説明】\n【背景技術】\n【０００１】\n本文です。")
        assert [n["kind"] for n in nodes] == ["heading1", "heading2", "para"]
        assert nodes[2]["no"] == "0001"

    def test_pending_marker(self):
        nodes = spans.classify_spans("[0016]\nbody text")
        assert nodes == [{"kind": "para", "no": "0016", "style": "square", "text": "body text"}]

    def test_join_wrapped(self):
        nodes = spans.classify_spans("word\nwrap\nです\nね")
        assert nodes[0]["text"] == "word wrapですね"

    def test_to_html_empty(self):
        assert spans.to_html("") == '<div class="patent-text">\n\n</div>'


class TestTextTransformer:
    def test_above_below(self):
        t = str(TextTransformer("a\nM\nb").above_exc("M", str.upper))
        assert t == "A\nM\nb"
        t = str(TextTransformer("a\nM\nb").below_inc("M", str.upper))
        assert t == "a\nM\nB"

    def test_range_order_insensitive(self):
        t = str(TextTransformer("x\nB\nm\nA\ny").range_exc("A", "B", str.upper))
        assert t == "x\nB\nM\nA\ny"

    def test_marker_lookup_uses_original_lines(self):
        # after an earlier transform rewrites the marker line, lookup still
        # finds it (markers resolved against _origLines)
        tt = TextTransformer("a\nM\nb").above_inc("M", str.upper)
        t = str(tt.below_exc("M", lambda s: s + "!"))
        assert t == "A\nM\nb!"

    def test_fw_num_mark(self):
        t = str(TextTransformer("引用：1、2").fw_num_mark("：", "、"))
        assert t == "引用：１、２"
        t = str(TextTransformer("引用：12").fw_num_mark("：", "、"))
        assert t == "引用：12"  # no sep -> unchanged


class TestBlocks:
    def test_convert_each_line_ipc(self):
        assert blocks.convert_each_line("H04B 7/24- 7/26") == "　　　　　　　　　　　　　　H04B  7/ 24-    7/ 26"

    def test_cau_terminator_inserts_blank(self):
        tail = "x\nこの拒絶理由通知の内容に関するお問合せをどうぞ"
        out = blocks.process_cau_tail("", tail)
        assert out.split("\n")[1] == ""

    def test_suggestion_line(self):
        assert blocks.convert_suggestion_number_line_to_full_width("(1)fewofwKAoefwp") == "(１)FewofwKAoefwp"

    def test_idempotent_js_trim(self):
        assert js_trim("　a　") == "a"
