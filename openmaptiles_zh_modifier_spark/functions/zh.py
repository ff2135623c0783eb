"""Chinese-script column functions.

Re-expresses the reference's three client-side scalar functions
(SURVEY.md §2.8) as pure Catalyst expressions — no UDF, no Python boundary:

  * ``is_han``        — OMTZHModifier.java:247-250 ``isHanScript``: true iff
                        any codepoint has Unicode script Han. Java regex
                        ``\\p{IsHan}`` is codepoint-wise, so non-BMP Han
                        (CJK Ext B+, e.g. U+20000) is detected correctly.
  * ``to_simplified`` — OMTZHModifier.java:228 ``ZhConverterUtil.toSimple``.
  * ``to_traditional``— OMTZHModifier.java:233 ``ZhConverterUtil.toTraditional``.

The reference uses the OpenCC dictionaries (word-level, via opencc4j). This
container has no OpenCC build, so conversion is a deterministic CHAR-LEVEL
mapping over a published common Traditional↔Simplified table, applied with
``F.translate`` — a single whole-stage-codegen JVM expression. Char-level
conversion is the standard degraded mode of OpenCC itself (its t2s/s2t char
dictionaries); word-level disambiguation (e.g. 干→乾/幹) is NOT attempted.
The mapping is exposed as module constants so the DuckDB oracle can run the
byte-identical ``translate`` and hash-match.

If a real ``opencc`` package is present, ``to_simplified_opencc`` /
``to_traditional_opencc`` provide Arrow-batched pandas-UDF variants behind an
import guard (the scale path for dictionary-accurate conversion).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java regex: any codepoint with Unicode script = Han. Codepoint-based, so a
# supplementary-plane Han char (surrogate pair in UTF-16) still matches —
# parity with Character.UnicodeScript.of(codePoint) in the reference.
HAN_REGEX = r"\p{IsHan}"
# RE2 (DuckDB) spelling of the same class, for oracle SQL generation.
HAN_REGEX_RE2 = r"\p{Han}"

# (traditional, simplified) pairs — one codepoint each side, both BMP.
# Common chars from the public OpenCC TSCharacters table (char-level subset).
# Order matters only for the reverse (s2t) build: when several traditional
# chars simplify to the same char (發/髮→发), the FIRST pair listed wins the
# reverse mapping — keep the most common traditional form first.
_T2S_PAIRS = [
    ("臺", "台"), ("灣", "湾"), ("國", "国"), ("學", "学"), ("語", "语"),
    ("書", "书"), ("車", "车"), ("馬", "马"), ("鳥", "鸟"), ("魚", "鱼"),
    ("龍", "龙"), ("門", "门"), ("長", "长"), ("東", "东"), ("風", "风"),
    ("雲", "云"), ("電", "电"), ("華", "华"), ("愛", "爱"), ("樂", "乐"),
    ("醫", "医"), ("體", "体"), ("聽", "听"), ("說", "说"), ("讀", "读"),
    ("寫", "写"), ("頭", "头"), ("買", "买"), ("賣", "卖"), ("見", "见"),
    ("貝", "贝"), ("頁", "页"), ("飛", "飞"), ("氣", "气"), ("漢", "汉"),
    ("鐵", "铁"), ("路", "路"), ("廣", "广"), ("場", "场"), ("園", "园"),
    ("橋", "桥"), ("島", "岛"), ("嶺", "岭"), ("灘", "滩"), ("河", "河"),
    ("江", "江"), ("湖", "湖"), ("海", "海"), ("灣", "湾"), ("峽", "峡"),
    ("縣", "县"), ("鎮", "镇"), ("鄉", "乡"), ("村", "村"), ("區", "区"),
    ("市", "市"), ("省", "省"), ("街", "街"), ("巷", "巷"), ("號", "号"),
    ("樓", "楼"), ("館", "馆"), ("廟", "庙"), ("寺", "寺"), ("塔", "塔"),
    ("宮", "宫"), ("殿", "殿"), ("陵", "陵"), ("關", "关"), ("站", "站"),
    ("機", "机"), ("航", "航"), ("運", "运"), ("輸", "输"), ("軌", "轨"),
    ("線", "线"), ("環", "环"), ("道", "道"), ("橫", "横"), ("縱", "纵"),
    ("發", "发"), ("髮", "发"), ("開", "开"), ("閉", "闭"), ("間", "间"),
    ("陽", "阳"), ("陰", "阴"), ("雙", "双"), ("單", "单"), ("豐", "丰"),
    ("寶", "宝"), ("禮", "礼"), ("義", "义"), ("議", "议"), ("記", "记"),
    ("計", "计"), ("設", "设"), ("訪", "访"), ("許", "许"), ("評", "评"),
    ("識", "识"), ("詞", "词"), ("試", "试"), ("詩", "诗"), ("誠", "诚"),
    ("誌", "志"), ("認", "认"), ("請", "请"), ("論", "论"), ("諸", "诸"),
    ("謝", "谢"), ("譯", "译"), ("護", "护"), ("財", "财"), ("貨", "货"),
    ("貴", "贵"), ("費", "费"), ("資", "资"), ("賓", "宾"), ("質", "质"),
    ("購", "购"), ("贈", "赠"), ("輕", "轻"), ("載", "载"), ("輪", "轮"),
    ("轉", "转"), ("農", "农"), ("連", "连"), ("週", "周"), ("進", "进"),
    ("遊", "游"), ("過", "过"), ("達", "达"), ("違", "违"), ("遠", "远"),
    ("適", "适"), ("選", "选"), ("遺", "遗"), ("還", "还"), ("邊", "边"),
    ("郵", "邮"), ("鄰", "邻"), ("釋", "释"), ("鐘", "钟"), ("鋼", "钢"),
    ("錄", "录"), ("錢", "钱"), ("錦", "锦"), ("鎖", "锁"), ("鏡", "镜"),
    ("閱", "阅"), ("陸", "陆"), ("際", "际"), ("隨", "随"), ("隱", "隐"),
    ("雞", "鸡"), ("難", "难"), ("雜", "杂"), ("靈", "灵"), ("靜", "静"),
    ("響", "响"), ("順", "顺"), ("須", "须"), ("頂", "顶"), ("項", "项"),
    ("領", "领"), ("顏", "颜"), ("顯", "显"), ("養", "养"), ("餐", "餐"),
    ("飯", "饭"), ("飲", "饮"), ("館", "馆"), ("驗", "验"), ("騎", "骑"),
    ("驚", "惊"), ("鬥", "斗"), ("鬧", "闹"), ("麗", "丽"), ("麥", "麦"),
    ("點", "点"), ("黨", "党"), ("齊", "齐"), ("齒", "齿"), ("龜", "龟"),
    ("優", "优"), ("傳", "传"), ("傷", "伤"), ("價", "价"), ("儀", "仪"),
    ("億", "亿"), ("兒", "儿"), ("內", "内"), ("兩", "两"), ("冊", "册"),
    ("軍", "军"), ("農", "农"), ("冬", "冬"), ("凍", "冻"), ("劃", "划"),
    ("劇", "剧"), ("劉", "刘"), ("創", "创"), ("務", "务"), ("動", "动"),
    ("勝", "胜"), ("勞", "劳"), ("勢", "势"), ("匯", "汇"), ("區", "区"),
    ("協", "协"), ("歷", "历"), ("曆", "历"), ("廳", "厅"), ("參", "参"),
    ("變", "变"), ("嚴", "严"), ("叢", "丛"), ("臨", "临"), ("為", "为"),
    ("烏", "乌"), ("習", "习"), ("鄭", "郑"), ("亞", "亚"), ("產", "产"),
    ("親", "亲"), ("億", "亿"), ("僅", "仅"), ("從", "从"), ("倉", "仓"),
    ("儀", "仪"), ("們", "们"), ("價", "价"), ("眾", "众"), ("優", "优"),
    ("夥", "伙"), ("會", "会"), ("傘", "伞"), ("偉", "伟"), ("傳", "传"),
    ("傷", "伤"), ("倫", "伦"), ("側", "侧"), ("僑", "侨"), ("俠", "侠"),
    ("係", "系"), ("繫", "系"), ("促", "促"), ("儉", "俭"), ("修", "修"),
    ("個", "个"), ("豫", "豫"), ("雅", "雅"), ("集", "集"), ("雄", "雄"),
    ("雖", "虽"), ("雨", "雨"), ("青", "青"), ("靠", "靠"), ("非", "非"),
    ("面", "面"), ("鞋", "鞋"), ("音", "音"), ("韻", "韵"), ("頻", "频"),
    ("題", "题"), ("額", "额"), ("願", "愿"), ("類", "类"), ("飄", "飘"),
    ("餘", "余"), ("駐", "驻"), ("驅", "驱"), ("骨", "骨"), ("高", "高"),
    ("魯", "鲁"), ("鮮", "鲜"), ("鳳", "凤"), ("鳴", "鸣"), ("鴻", "鸿"),
    ("鵬", "鹏"), ("黃", "黄"), ("黑", "黑"), ("墨", "墨"), ("默", "默"),
    ("鼓", "鼓"), ("鼠", "鼠"), ("鼻", "鼻"), ("北", "北"), ("京", "京"),
    ("南", "南"), ("西", "西"), ("中", "中"), ("山", "山"), ("川", "川"),
    ("州", "州"), ("港", "港"), ("澳", "澳"), ("廈", "厦"), ("門", "门"),
    ("慶", "庆"), ("應", "应"), ("廢", "废"), ("廟", "庙"), ("廠", "厂"),
    ("異", "异"), ("當", "当"), ("疊", "叠"), ("癡", "痴"), ("發", "发"),
    ("皚", "皑"), ("盤", "盘"), ("監", "监"), ("盡", "尽"), ("礎", "础"),
    ("確", "确"), ("礦", "矿"), ("禍", "祸"), ("萬", "万"), ("與", "与"),
    ("專", "专"), ("業", "业"), ("叢", "丛"), ("絲", "丝"), ("麗", "丽"),
    ("舉", "举"), ("義", "义"), ("烏", "乌"), ("樂", "乐"), ("喬", "乔"),
    ("習", "习"), ("鄉", "乡"), ("雲", "云"), ("畝", "亩"), ("廚", "厨"),
    ("縮", "缩"), ("織", "织"), ("繼", "继"), ("續", "续"), ("維", "维"),
    ("綜", "综"), ("網", "网"), ("罰", "罚"), ("羅", "罗"), ("義", "义"),
    ("聖", "圣"), ("聯", "联"), ("聲", "声"), ("職", "职"), ("肅", "肃"),
    ("腦", "脑"), ("膚", "肤"), ("臟", "脏"), ("艦", "舰"), ("藝", "艺"),
    ("藍", "蓝"), ("藥", "药"), ("蘇", "苏"), ("蘭", "兰"), ("處", "处"),
    ("號", "号"), ("蟲", "虫"), ("術", "术"), ("裝", "装"), ("補", "补"),
    ("製", "制"), ("複", "复"), ("規", "规"), ("視", "视"), ("覺", "觉"),
    ("觀", "观"), ("角", "角"), ("解", "解"), ("觸", "触"), ("訓", "训"),
]

# Build 1:1 translate alphabets (dedup by source char; first occurrence wins).


def _build_alphabets() -> tuple[str, str, str, str]:
    t2s_from, t2s_to = [], []
    seen_t: set[str] = set()
    for t, s in _T2S_PAIRS:
        if t in seen_t or t == s:
            continue
        seen_t.add(t)
        t2s_from.append(t)
        t2s_to.append(s)
    s2t_from, s2t_to = [], []
    seen_s: set[str] = set()
    for t, s in _T2S_PAIRS:
        if s in seen_s or t == s:
            continue
        seen_s.add(s)
        s2t_from.append(s)
        s2t_to.append(t)
    return "".join(t2s_from), "".join(t2s_to), "".join(s2t_from), "".join(s2t_to)


T2S_FROM, T2S_TO, S2T_FROM, S2T_TO = _build_alphabets()

# ---------------------------------------------------------------------------
# Word-level disambiguation pre-pass (a subset of the public OpenCC
# TSPhrases/STPhrases idea): multi-char words whose conversion the char
# table cannot decide are rewritten FIRST; the char-level translate then
# handles everything else. This is exactly how opencc resolves 干/乾/幹,
# 发/發/髮, 后/後, 里/裡 — by word, not by char. Applied longest-first so
# overlapping entries resolve deterministically; the DuckDB oracle emits
# the identical replace() chain (see *_sql below), so the two engines stay
# bit-identical. Ambiguous single chars (干, 后, 里, 面) remain absent
# from the char table ON PURPOSE: outside a known word there is no safe
# char-level answer.
# ---------------------------------------------------------------------------

# traditional word -> simplified word (t2s direction)
T2S_PHRASES: list[tuple[str, str]] = [
    ("乾燥", "干燥"), ("乾杯", "干杯"), ("乾淨", "干净"), ("餅乾", "饼干"),
    ("乾旱", "干旱"), ("幹部", "干部"), ("幹活", "干活"), ("能幹", "能干"),
    ("裡面", "里面"), ("裏面", "里面"), ("這裡", "这里"), ("那裡", "那里"),
    ("哪裡", "哪里"), ("後面", "后面"), ("以後", "以后"), ("之後", "之后"),
    ("最後", "最后"), ("後來", "后来"), ("麵條", "面条"), ("麵包", "面包"),
]

# simplified word -> traditional word (s2t direction)
S2T_PHRASES: list[tuple[str, str]] = [
    ("头发", "頭髮"), ("理发", "理髮"), ("假发", "假髮"), ("发型", "髮型"),
    ("发廊", "髮廊"), ("干燥", "乾燥"), ("干杯", "乾杯"), ("干净", "乾淨"),
    ("饼干", "餅乾"), ("干旱", "乾旱"), ("干部", "幹部"), ("干活", "幹活"),
    ("能干", "能幹"), ("里面", "裡面"), ("这里", "這裡"), ("那里", "那裡"),
    ("哪里", "哪裡"), ("后面", "後面"), ("以后", "以後"), ("之后", "之後"),
    ("最后", "最後"), ("后来", "後來"), ("面条", "麵條"), ("面包", "麵包"),
]


def _phrase_order(pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Longest source first (stable) — identical ordering on both engines."""
    return sorted(pairs, key=lambda p: (-len(p[0]), p[0]))


def is_han(col: Column | str) -> Column:
    """True iff the string contains at least one Han-script codepoint.

    Parity target: OMTZHModifier.java:247-250 (Character.UnicodeScript.HAN
    over codepoints). ``rlike`` with ``\\p{IsHan}`` is evaluated by Java
    regex per-codepoint, so CJK Extension B+ (non-BMP) matches too.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(HAN_REGEX)


def to_simplified(col: Column | str) -> Column:
    """Traditional → Simplified: word-level phrase pre-pass, then
    char-level translate (see module docstring). One codegen expression."""
    c = F.col(col) if isinstance(col, str) else col
    for src, dst in _phrase_order(T2S_PHRASES):
        c = F.replace(c, F.lit(src), F.lit(dst))
    return F.translate(c, T2S_FROM, T2S_TO)


def to_traditional(col: Column | str) -> Column:
    """Simplified → Traditional: word-level phrase pre-pass, then
    char-level translate (see module docstring). One codegen expression."""
    c = F.col(col) if isinstance(col, str) else col
    for src, dst in _phrase_order(S2T_PHRASES):
        c = F.replace(c, F.lit(src), F.lit(dst))
    return F.translate(c, S2T_FROM, S2T_TO)


def to_simplified_sql(expr: str) -> str:
    """DuckDB SQL with the IDENTICAL phrase chain + translate as
    :func:`to_simplified` — the oracle twin."""
    out = expr
    for src, dst in _phrase_order(T2S_PHRASES):
        out = f"replace({out}, '{src}', '{dst}')"
    return f"translate({out}, '{T2S_FROM}', '{T2S_TO}')"


def to_traditional_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`to_traditional`."""
    out = expr
    for src, dst in _phrase_order(S2T_PHRASES):
        out = f"replace({out}, '{src}', '{dst}')"
    return f"translate({out}, '{S2T_FROM}', '{S2T_TO}')"


def nullif_empty(col: Column | str) -> Column:
    """Empty string → NULL (OMTZHModifier.java:220-225 normalization)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(""))


# ---------------------------------------------------------------------------
# Optional dictionary-accurate path (only if a real opencc is installed).
# Arrow-batched pandas UDFs with per-executor lazy converter init — the
# pattern a production deployment with OpenCC dictionaries would use.
# ---------------------------------------------------------------------------

try:  # pragma: no cover - container has no opencc
    import opencc as _opencc  # noqa: F401

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    _CONVERTERS: dict[str, object] = {}

    def _get_converter(config: str):
        conv = _CONVERTERS.get(config)
        if conv is None:
            conv = _opencc.OpenCC(config)
            _CONVERTERS[config] = conv
        return conv

    @pandas_udf(StringType())
    def to_simplified_opencc(s):  # type: ignore[no-untyped-def]
        conv = _get_converter("t2s")
        return s.map(lambda x: conv.convert(x) if x is not None else None)

    @pandas_udf(StringType())
    def to_traditional_opencc(s):  # type: ignore[no-untyped-def]
        conv = _get_converter("s2t")
        return s.map(lambda x: conv.convert(x) if x is not None else None)

    HAS_OPENCC = True
except ImportError:
    HAS_OPENCC = False
