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
container has no OpenCC build, so conversion is (1) a word-level phrase
pre-pass (an OpenCC TSPhrases/STPhrases subset, ~350 s2t + ~40 t2s
disambiguation words, expressed as ONE ``aggregate`` reduce — see
``_phrase_fold`` for why not a replace chain) followed by (2) a
deterministic CHAR-LEVEL ``F.translate`` over ~1100 t2s / ~1000 s2t pairs
from the public OpenCC TSCharacters data. Char tables are DIRECTION-SCOPED:
a traditional char may safely collapse t2s while its simplified form must
not blindly reverse (後→后 but 皇后 keeps 后), so those pairs feed only the
t2s alphabet and the s2t side relies on phrases + its own defaults. The
mapping is exposed as module constants so the DuckDB oracle can run the
byte-identical ``translate`` chain and hash-match. Residual divergence vs
full OpenCC (OOV ambiguous words) is measured by
tests/test_zh_backfill.py::test_opencc_divergence_envelope.

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
    ("認", "认"), ("請", "请"), ("論", "论"), ("諸", "诸"),
    ("謝", "谢"), ("譯", "译"), ("護", "护"), ("財", "财"), ("貨", "货"),
    ("貴", "贵"), ("費", "费"), ("資", "资"), ("賓", "宾"), ("質", "质"),
    ("購", "购"), ("贈", "赠"), ("輕", "轻"), ("載", "载"), ("輪", "轮"),
    ("轉", "转"), ("農", "农"), ("連", "连"), ("進", "进"),
    ("過", "过"), ("達", "达"), ("違", "违"), ("遠", "远"),
    ("適", "适"), ("選", "选"), ("遺", "遗"), ("還", "还"), ("邊", "边"),
    ("郵", "邮"), ("鄰", "邻"), ("釋", "释"), ("鐘", "钟"), ("鋼", "钢"),
    ("錄", "录"), ("錢", "钱"), ("錦", "锦"), ("鎖", "锁"), ("鏡", "镜"),
    ("閱", "阅"), ("陸", "陆"), ("際", "际"), ("隨", "随"), ("隱", "隐"),
    ("雞", "鸡"), ("難", "难"), ("雜", "杂"), ("靈", "灵"), ("靜", "静"),
    ("響", "响"), ("順", "顺"), ("須", "须"), ("頂", "顶"), ("項", "项"),
    ("領", "领"), ("顏", "颜"), ("顯", "显"), ("養", "养"), ("餐", "餐"),
    ("飯", "饭"), ("飲", "饮"), ("館", "馆"), ("驗", "验"), ("騎", "骑"),
    ("驚", "惊"), ("鬧", "闹"), ("麗", "丽"), ("麥", "麦"),
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
    ("會", "会"), ("傘", "伞"), ("偉", "伟"), ("傳", "传"),
    ("傷", "伤"), ("倫", "伦"), ("側", "侧"), ("僑", "侨"), ("俠", "侠"),
    ("促", "促"), ("儉", "俭"), ("修", "修"),
    ("個", "个"), ("豫", "豫"), ("雅", "雅"), ("集", "集"), ("雄", "雄"),
    ("雖", "虽"), ("雨", "雨"), ("青", "青"), ("靠", "靠"), ("非", "非"),
    ("面", "面"), ("鞋", "鞋"), ("音", "音"), ("韻", "韵"), ("頻", "频"),
    ("題", "题"), ("額", "额"), ("願", "愿"), ("類", "类"), ("飄", "飘"),
    ("駐", "驻"), ("驅", "驱"), ("骨", "骨"), ("高", "高"),
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
    ("規", "规"), ("視", "视"), ("覺", "觉"),
    ("觀", "观"), ("角", "角"), ("解", "解"), ("觸", "触"), ("訓", "训"),
    # --- round-3 expansion: the high-frequency remainder of the public
    # OpenCC TSCharacters data (bidirectional-safe 1:1 chars only; chars
    # whose reverse is ambiguous live in _T2S_ONLY_PAIRS below) ---
    ("現", "现"), ("寬", "宽"), ("覽", "览"), ("負", "负"), ("貢", "贡"),
    ("責", "责"), ("賢", "贤"), ("敗", "败"), ("賬", "账"), ("貯", "贮"),
    ("貼", "贴"), ("貸", "贷"), ("貿", "贸"), ("賀", "贺"), ("賃", "赁"),
    ("賊", "贼"), ("賠", "赔"), ("賦", "赋"), ("賭", "赌"), ("賴", "赖"),
    ("賽", "赛"), ("贊", "赞"), ("贏", "赢"), ("贓", "赃"), ("贖", "赎"),
    ("貧", "贫"), ("貪", "贪"), ("貫", "贯"), ("實", "实"), ("賤", "贱"),
    ("訂", "订"), ("訊", "讯"), ("討", "讨"), ("證", "证"), ("訴", "诉"),
    ("診", "诊"), ("詔", "诏"), ("誇", "夸"), ("話", "话"), ("誕", "诞"),
    ("詮", "诠"), ("說", "说"), ("誦", "诵"), ("調", "调"), ("諒", "谅"),
    ("謀", "谋"), ("諜", "谍"), ("謊", "谎"), ("諧", "谐"), ("謂", "谓"),
    ("諭", "谕"), ("諮", "谘"), ("諺", "谚"), ("謎", "谜"), ("謗", "谤"),
    ("謙", "谦"), ("講", "讲"), ("謠", "谣"), ("謬", "谬"), ("謹", "谨"),
    ("譏", "讥"), ("譚", "谭"), ("譜", "谱"), ("譽", "誉"), ("讓", "让"),
    ("訝", "讶"), ("詳", "详"), ("誤", "误"), ("誘", "诱"), ("語", "语"),
    ("釘", "钉"), ("針", "针"), ("釣", "钓"), ("鈔", "钞"), ("鈍", "钝"),
    ("鈣", "钙"), ("鈕", "钮"), ("鈴", "铃"), ("鉛", "铅"), ("銀", "银"),
    ("銅", "铜"), ("銘", "铭"), ("鋁", "铝"), ("鋒", "锋"), ("鋤", "锄"),
    ("鋪", "铺"), ("銷", "销"), ("鋸", "锯"), ("錯", "错"), ("錘", "锤"),
    ("錨", "锚"), ("錫", "锡"), ("鍋", "锅"), ("鍵", "键"), ("鍛", "锻"),
    ("鎊", "镑"), ("鏈", "链"), ("鏟", "铲"), ("鏢", "镖"), ("鑄", "铸"),
    ("鑰", "钥"), ("鑲", "镶"), ("鑼", "锣"), ("鑽", "钻"), ("鈞", "钧"),
    ("鉤", "钩"), ("鉗", "钳"), ("鉀", "钾"), ("銜", "衔"), ("鋅", "锌"),
    ("錐", "锥"), ("錠", "锭"), ("鎬", "镐"), ("鎳", "镍"), ("鎢", "钨"),
    ("鏽", "锈"), ("鑒", "鉴"), ("閃", "闪"), ("問", "问"), ("閘", "闸"),
    ("閑", "闲"), ("閣", "阁"), ("閥", "阀"), ("閨", "闺"), ("聞", "闻"),
    ("閩", "闽"), ("闊", "阔"), ("闖", "闯"), ("闡", "阐"), ("閻", "阎"),
    ("糾", "纠"), ("紀", "纪"), ("約", "约"), ("紅", "红"), ("紉", "纫"),
    ("紋", "纹"), ("納", "纳"), ("紐", "纽"), ("純", "纯"), ("紗", "纱"),
    ("紙", "纸"), ("級", "级"), ("紛", "纷"), ("紡", "纺"), ("細", "细"),
    ("紳", "绅"), ("紹", "绍"), ("終", "终"), ("組", "组"), ("結", "结"),
    ("絕", "绝"), ("絞", "绞"), ("絡", "络"), ("給", "给"), ("絨", "绒"),
    ("統", "统"), ("絹", "绢"), ("綁", "绑"), ("經", "经"), ("綠", "绿"),
    ("綢", "绸"), ("綱", "纲"), ("綴", "缀"), ("綸", "纶"), ("綿", "绵"),
    ("緊", "紧"), ("緒", "绪"), ("緝", "缉"), ("緞", "缎"), ("締", "缔"),
    ("緣", "缘"), ("編", "编"), ("緩", "缓"), ("緬", "缅"), ("緯", "纬"),
    ("練", "练"), ("縛", "缚"), ("縫", "缝"), ("縷", "缕"), ("總", "总"),
    ("績", "绩"), ("繃", "绷"), ("繩", "绳"), ("繡", "绣"), ("繪", "绘"),
    ("繞", "绕"), ("繳", "缴"), ("繽", "缤"), ("纏", "缠"), ("纖", "纤"),
    ("纜", "缆"), ("絲", "丝"),
    ("頃", "顷"), ("頑", "顽"), ("頒", "颁"), ("頌", "颂"), ("預", "预"),
    ("頗", "颇"), ("頰", "颊"), ("頸", "颈"), ("頹", "颓"), ("頤", "颐"),
    ("顆", "颗"), ("顛", "颠"), ("顧", "顾"), ("顫", "颤"), ("顱", "颅"),
    ("頓", "顿"),
    ("飢", "饥"), ("飽", "饱"), ("飾", "饰"), ("餃", "饺"), ("餅", "饼"),
    ("餓", "饿"), ("餒", "馁"), ("餡", "馅"), ("饅", "馒"), ("饒", "饶"),
    ("饞", "馋"), ("飼", "饲"), ("餵", "喂"),
    ("馭", "驭"), ("馴", "驯"), ("馳", "驰"), ("駁", "驳"), ("駛", "驶"),
    ("駝", "驼"), ("駕", "驾"), ("駿", "骏"), ("騁", "骋"), ("騙", "骗"),
    ("騷", "骚"), ("騾", "骡"), ("驕", "骄"), ("驛", "驿"), ("驟", "骤"),
    ("驢", "驴"), ("駱", "骆"), ("騰", "腾"), ("駭", "骇"), ("馮", "冯"),
    ("魷", "鱿"), ("鮑", "鲍"), ("鯉", "鲤"), ("鯊", "鲨"), ("鯨", "鲸"),
    ("鰓", "鳃"), ("鰭", "鳍"), ("鰻", "鳗"), ("鱷", "鳄"), ("鱉", "鳖"),
    ("鱔", "鳝"), ("鱗", "鳞"),
    ("鳩", "鸠"), ("鴉", "鸦"), ("鴨", "鸭"), ("鴛", "鸳"), ("鴦", "鸯"),
    ("鴿", "鸽"), ("鵑", "鹃"), ("鵝", "鹅"), ("鵡", "鹉"), ("鶯", "莺"),
    ("鶴", "鹤"), ("鷗", "鸥"), ("鷹", "鹰"), ("鸚", "鹦"), ("鵲", "鹊"),
    ("鷺", "鹭"),
    ("軋", "轧"), ("軒", "轩"), ("軟", "软"), ("軸", "轴"), ("較", "较"),
    ("輔", "辅"), ("輛", "辆"), ("輝", "辉"), ("輩", "辈"), ("輻", "辐"),
    ("輯", "辑"), ("轄", "辖"), ("輿", "舆"), ("轅", "辕"), ("轍", "辙"),
    ("轎", "轿"), ("轟", "轰"), ("輟", "辍"),
    ("喪", "丧"), ("嗎", "吗"), ("嘔", "呕"), ("嘆", "叹"), ("嘩", "哗"),
    ("嘯", "啸"), ("嘰", "叽"), ("噴", "喷"), ("嚇", "吓"), ("囂", "嚣"),
    ("囑", "嘱"), ("圍", "围"), ("圓", "圆"), ("圖", "图"), ("團", "团"),
    ("壇", "坛"), ("壓", "压"), ("壘", "垒"), ("壞", "坏"), ("壟", "垄"),
    ("壩", "坝"), ("壯", "壮"), ("壽", "寿"), ("奪", "夺"), ("奮", "奋"),
    ("婦", "妇"), ("媽", "妈"), ("嬌", "娇"), ("嬰", "婴"), ("嬸", "婶"),
    ("孫", "孙"), ("寧", "宁"), ("審", "审"), ("導", "导"), ("對", "对"),
    ("將", "将"), ("尋", "寻"), ("屆", "届"), ("屜", "屉"), ("屬", "属"),
    ("層", "层"), ("屢", "屡"), ("嶄", "崭"), ("嶼", "屿"), ("巒", "峦"),
    ("帥", "帅"), ("師", "师"), ("帳", "帐"), ("帶", "带"), ("幣", "币"),
    ("幫", "帮"), ("幾", "几"), ("庫", "库"), ("廁", "厕"), ("廂", "厢"),
    ("廬", "庐"), ("彎", "弯"), ("彈", "弹"), ("彌", "弥"), ("彥", "彦"),
    ("徑", "径"), ("徹", "彻"), ("恆", "恒"), ("恥", "耻"), ("悶", "闷"),
    ("惡", "恶"), ("惱", "恼"), ("憊", "惫"), ("憐", "怜"), ("憑", "凭"),
    ("憲", "宪"), ("憶", "忆"), ("懇", "恳"), ("懲", "惩"), ("懶", "懒"),
    ("懷", "怀"), ("懸", "悬"), ("懼", "惧"), ("戀", "恋"), ("戰", "战"),
    ("戲", "戏"), ("掃", "扫"), ("挾", "挟"), ("掙", "挣"), ("掛", "挂"),
    ("揀", "拣"), ("揚", "扬"), ("搖", "摇"), ("搗", "捣"), ("摟", "搂"),
    ("摯", "挚"), ("擁", "拥"), ("擋", "挡"), ("擇", "择"), ("擊", "击"),
    ("擠", "挤"), ("擬", "拟"), ("擴", "扩"), ("擲", "掷"), ("擾", "扰"),
    ("攏", "拢"), ("攔", "拦"), ("攜", "携"), ("攝", "摄"), ("攢", "攒"),
    ("攤", "摊"), ("攪", "搅"), ("敵", "敌"), ("數", "数"), ("斂", "敛"),
    ("斃", "毙"), ("斷", "断"), ("時", "时"), ("晉", "晋"), ("晝", "昼"),
    ("暈", "晕"), ("暢", "畅"), ("曉", "晓"), ("曬", "晒"), ("棄", "弃"),
    ("棧", "栈"), ("條", "条"), ("棗", "枣"), ("棟", "栋"), ("棲", "栖"),
    ("樁", "桩"), ("標", "标"), ("樞", "枢"), ("樣", "样"), ("樸", "朴"),
    ("樹", "树"), ("檔", "档"), ("檢", "检"), ("櫃", "柜"), ("櫥", "橱"),
    ("櫻", "樱"), ("權", "权"), ("欄", "栏"), ("欖", "榄"), ("歡", "欢"),
    ("歲", "岁"), ("歸", "归"), ("殘", "残"), ("殺", "杀"), ("殼", "壳"),
    ("毀", "毁"), ("毆", "殴"), ("氈", "毡"), ("氫", "氢"), ("氬", "氩"),
    ("溝", "沟"), ("況", "况"), ("淚", "泪"), ("淺", "浅"), ("渦", "涡"),
    ("測", "测"), ("湊", "凑"), ("湯", "汤"), ("濕", "湿"), ("濟", "济"),
    ("濤", "涛"), ("濫", "滥"), ("濱", "滨"), ("濾", "滤"), ("瀉", "泻"),
    ("瀏", "浏"), ("瀕", "濒"), ("瀝", "沥"), ("瀟", "潇"), ("灑", "洒"),
    ("災", "灾"), ("無", "无"), ("煙", "烟"), ("煥", "焕"), ("熱", "热"),
    ("燈", "灯"), ("燒", "烧"), ("燙", "烫"), ("營", "营"), ("燦", "灿"),
    ("燭", "烛"), ("爍", "烁"), ("爐", "炉"), ("爛", "烂"), ("爭", "争"),
    ("爺", "爷"), ("爾", "尔"), ("牆", "墙"), ("犧", "牺"), ("狀", "状"),
    ("獄", "狱"), ("獅", "狮"), ("獎", "奖"), ("獨", "独"), ("獲", "获"),
    ("獸", "兽"), ("獻", "献"), ("瑪", "玛"), ("瓊", "琼"), ("畫", "画"),
    ("疇", "畴"), ("療", "疗"), ("瘋", "疯"), ("瘡", "疮"), ("瘧", "疟"),
    ("癢", "痒"), ("癱", "瘫"), ("皺", "皱"), ("盞", "盏"), ("鹽", "盐"),
    ("蓋", "盖"), ("盧", "卢"), ("睜", "睁"), ("睞", "睐"), ("瞞", "瞒"),
    ("矯", "矫"), ("磚", "砖"), ("礙", "碍"), ("礫", "砾"), ("祿", "禄"),
    ("禪", "禅"), ("種", "种"), ("稱", "称"), ("積", "积"), ("穎", "颖"),
    ("穩", "稳"), ("窩", "窝"), ("窪", "洼"), ("窮", "穷"), ("竅", "窍"),
    ("竊", "窃"), ("豎", "竖"), ("競", "竞"), ("筆", "笔"), ("筍", "笋"),
    ("節", "节"), ("築", "筑"), ("篤", "笃"), ("簍", "篓"), ("簡", "简"),
    ("簽", "签"), ("籃", "篮"), ("籌", "筹"), ("籠", "笼"), ("糞", "粪"),
    ("糧", "粮"), ("聾", "聋"), ("腸", "肠"), ("膽", "胆"), ("膠", "胶"),
    ("臉", "脸"), ("膿", "脓"), ("臘", "腊"), ("舊", "旧"), ("艙", "舱"),
    ("艱", "艰"), ("蘆", "芦"), ("蘿", "萝"), ("虛", "虚"), ("蝦", "虾"),
    ("螞", "蚂"), ("螢", "萤"), ("蟬", "蝉"), ("蟻", "蚁"), ("蠅", "蝇"),
    ("蠟", "蜡"), ("蠶", "蚕"), ("衛", "卫"), ("襖", "袄"), ("襯", "衬"),
    ("貓", "猫"), ("踐", "践"), ("蹤", "踪"), ("軀", "躯"), ("辦", "办"),
    ("辭", "辞"), ("辮", "辫"), ("辯", "辩"), ("邁", "迈"), ("遞", "递"),
    ("遷", "迁"), ("遼", "辽"), ("邏", "逻"), ("鄧", "邓"), ("醬", "酱"),
    ("釀", "酿"), ("陝", "陕"), ("隊", "队"), ("階", "阶"), ("隕", "陨"),
    ("險", "险"), ("雛", "雏"), ("離", "离"), ("霧", "雾"), ("靂", "雳"),
    ("鹼", "碱"), ("齋", "斋"), ("齦", "龈"), ("龐", "庞"), ("龔", "龚"),
    ("嘗", "尝"), ("飆", "飙"), ("鬢", "鬓"), ("鹵", "卤"), ("韻", "韵"),
    # --- round-4 expansion: remaining high-frequency 1:1 chars from the
    # public OpenCC TSCharacters inventory (bidirectional-safe only) ---
    ("夢", "梦"), ("憂", "忧"), ("慮", "虑"), ("擔", "担"), ("據", "据"),
    ("獵", "猎"), ("罷", "罢"), ("聰", "聪"), ("賜", "赐"), ("韋", "韦"),
    ("葉", "叶"), ("滅", "灭"), ("滬", "沪"), ("漲", "涨"), ("潤", "润"),
    ("澤", "泽"), ("濃", "浓"), ("潔", "洁"), ("猶", "犹"), ("畢", "毕"),
    ("盜", "盗"), ("禱", "祷"), ("窯", "窑"), ("繭", "茧"), ("罵", "骂"),
    ("羨", "羡"), ("聶", "聂"), ("臥", "卧"), ("艷", "艳"), ("莊", "庄"),
    ("蓮", "莲"), ("薦", "荐"), ("薩", "萨"), ("蕭", "萧"), ("蔣", "蒋"),
    ("襲", "袭"), ("覓", "觅"), ("訣", "诀"), ("譴", "谴"), ("賈", "贾"),
    ("贛", "赣"), ("趙", "赵"), ("躍", "跃"), ("遜", "逊"), ("煉", "炼"),
    ("鐮", "镰"), ("隴", "陇"), ("韓", "韩"), ("齡", "龄"), ("虧", "亏"),
    ("勳", "勋"), ("勵", "励"), ("勸", "劝"), ("渾", "浑"), ("濺", "溅"),
    ("瀾", "澜"), ("熾", "炽"), ("燉", "炖"), ("瑣", "琐"), ("璽", "玺"),
    ("癮", "瘾"), ("硯", "砚"), ("碩", "硕"), ("禿", "秃"), ("稅", "税"),
    ("竄", "窜"), ("篩", "筛"), ("聳", "耸"), ("膩", "腻"), ("蘊", "蕴"),
    ("蠻", "蛮"), ("誼", "谊"), ("豬", "猪"), ("貳", "贰"), ("遙", "遥"),
    ("鋰", "锂"), ("鍍", "镀"), ("鎂", "镁"), ("閡", "阂"), ("闌", "阑"),
    ("陣", "阵"), ("隸", "隶"), ("颶", "飓"), ("骯", "肮"), ("鯽", "鲫"),
    ("鴕", "鸵"), ("轄", "辖"), ("滄", "沧"), ("澇", "涝"), ("漁", "渔"),
    ("滲", "渗"), ("潰", "溃"), ("濁", "浊"), ("滌", "涤"), ("澆", "浇"),
    ("濰", "潍"), ("灤", "滦"), ("滇", "滇"), ("滾", "滚"), ("滿", "满"),
    ("灄", "滠"), ("灠", "漤"), ("煩", "烦"), ("爍", "烁"), ("牽", "牵"),
    ("犖", "荦"), ("獰", "狞"), ("獎", "奖"), ("瑩", "莹"), ("瓔", "璎"),
    ("瘺", "瘘"), ("皖", "皖"), ("盞", "盏"), ("眥", "眦"), ("瞼", "睑"),
    ("磧", "碛"), ("磽", "硗"), ("禕", "祎"), ("稟", "禀"), ("窶", "窭"),
    ("筧", "笕"), ("箏", "筝"), ("籜", "箨"), ("糝", "糁"), ("縞", "缟"),
    ("纈", "缬"), ("罌", "罂"), ("聵", "聩"), ("脛", "胫"), ("艫", "舻"),
    ("蘄", "蕲"), ("蟯", "蛲"), ("褳", "裢"), ("覘", "觇"),
    ("誆", "诓"), ("賚", "赉"), ("躓", "踬"), ("輦", "辇"), ("郟", "郏"),
    ("釃", "酾"), ("鉸", "铰"), ("鍘", "铡"), ("鏌", "镆"), ("闈", "闱"),
    ("隉", "陧"), ("靦", "腼"), ("頎", "颀"), ("颼", "飕"), ("骼", "骼"),
    ("鱭", "鲚"), ("鷥", "鸶"), ("黽", "黾"),
    # round-4 closure sweep: chars used by s2t phrase OUTPUTS whose t2s
    # reverse was missing (found by the whole-domain cycle property in
    # tests/test_parity_properties.py)
    ("涼", "凉"), ("則", "则"), ("備", "备"), ("夾", "夹"), ("報", "报"),
    ("勁", "劲"), ("強", "强"), ("搶", "抢"), ("蕩", "荡"), ("亂", "乱"),
    ("脫", "脱"), ("蔥", "葱"),
    # round-5 map-domain probe: unambiguous 1:1 chars the table missed
    # (码头/山脉/温泉/殡仪馆 diverged)
    ("碼", "码"), ("脈", "脉"), ("溫", "温"), ("殯", "殡"),
    ("興", "兴"),  # place-name probe: 大兴安岭/高兴 were not converting
]

# Traditional chars that safely simplify but whose SIMPLIFIED form must
# NOT reverse-map at char level — the simplified char is itself a valid
# (or ambiguous) traditional char, or several traditional chars collapse
# onto it and the right reverse needs word context (the phrase tables
# carry that). These feed ONLY the t2s alphabet.
_T2S_ONLY_PAIRS = [
    ("後", "后"), ("裡", "里"), ("裏", "里"), ("麵", "面"), ("髮", "发"),
    ("幹", "干"), ("隻", "只"), ("鬆", "松"), ("徵", "征"), ("餘", "余"),
    ("製", "制"), ("係", "系"), ("繫", "系"), ("週", "周"), ("鬥", "斗"),
    ("誌", "志"), ("夥", "伙"), ("複", "复"), ("復", "复"), ("鍾", "钟"),
    ("颱", "台"), ("檯", "台"), ("穀", "谷"), ("範", "范"), ("禦", "御"),
    ("鬍", "胡"), ("鬚", "须"), ("髒", "脏"), ("衝", "冲"),
    # round 5: 瞭 moved OUT (瞭望/瞭哨 keep 瞭 in the PRC standard, so
    # char-level 瞭→了 is wrong there; the liǎo words go via phrases);
    # 麼/麽 added (the particle collapses to 么 unconditionally — the
    # 幺麼 literary word is vanishingly rare)
    ("麼", "么"), ("麽", "么"),
    ("沖", "冲"), ("齣", "出"), ("鹹", "咸"), ("颳", "刮"), ("黴", "霉"),
    ("嚐", "尝"), ("傢", "家"), ("閒", "闲"), ("銹", "锈"), ("鑑", "鉴"),
    ("彙", "汇"), ("噁", "恶"), ("嘍", "喽"),
    # --- round-4 expansion: more safe-collapse-only chars (the reverse
    # needs word context or defaults to a different traditional char) ---
    ("遊", "游"),  # 游泳/上游 must STAY 游 in s2t; 旅遊/遊戲 via phrases
    ("穫", "获"),  # s2t default 获→獲; 收穫 via phrase
    ("纔", "才"), ("紮", "扎"), ("籲", "吁"), ("闢", "辟"), ("鉅", "巨"),
    ("糰", "团"), ("緻", "致"), ("薑", "姜"), ("蹟", "迹"), ("跡", "迹"),
    ("醜", "丑"),  # 小丑 (opera role) stays 丑; 醜陋 via phrases
    ("豔", "艳"),  # variant; default reverse is 艷
    ("蔭", "荫"), ("嶽", "岳"), ("簾", "帘"), ("湧", "涌"), ("衹", "只"),
    ("闆", "板"), ("彆", "别"), ("蔔", "卜"), ("佈", "布"), ("採", "采"),
    ("澱", "淀"), ("佔", "占"), ("嚮", "向"), ("鬱", "郁"), ("錶", "表"),
    ("準", "准"), ("儘", "尽"), ("鞦", "秋"), ("韆", "千"), ("籤", "签"),
    ("姦", "奸"), ("崙", "仑"), ("崑", "昆"), ("嚦", "呖"), ("囌", "苏"),
    ("獼", "猕"), ("慾", "欲"),
    # moved out of the bidirectional table in round 4 (the simplified
    # char's s2t default is ITSELF — 宿舍/试卷/幸福/雇主/托儿所/咽喉/凶 —
    # and the traditional form comes only via phrases)
    ("捨", "舍"), ("捲", "卷"), ("兇", "凶"), ("倖", "幸"),
    ("僱", "雇"), ("託", "托"), ("嚥", "咽"), ("迴", "回"),
    ("樑", "梁"),  # surname/place 梁 stays 梁 in s2t; 橋樑 via phrases
    ("瀋", "沈"),  # 瀋陽 -> 沈阳; s2t default keeps surname 沈 (phrase
                   # recovers 沈阳 -> 瀋陽)
]

# Simplified chars whose DEFAULT traditional form is not the reverse of
# any pair above (OpenCC STCharacters defaults). Feed ONLY s2t.
_S2T_ONLY_PAIRS = [
    ("復", "复"),  # 复 defaults to 復 (恢復/復習); 複 comes via phrases
]

# Build 1:1 translate alphabets (dedup by source char; first occurrence wins).


def _build_alphabets() -> tuple[str, str, str, str]:
    t2s_from, t2s_to = [], []
    seen_t: set[str] = set()
    for t, s in _T2S_PAIRS + _T2S_ONLY_PAIRS:
        if t in seen_t or t == s:
            continue
        seen_t.add(t)
        t2s_from.append(t)
        t2s_to.append(s)
    s2t_from, s2t_to = [], []
    seen_s: set[str] = set()
    for t, s in _S2T_ONLY_PAIRS + _T2S_PAIRS:
        if s in seen_s or t == s:
            continue
        seen_s.add(s)
        s2t_from.append(s)
        s2t_to.append(t)
    return "".join(t2s_from), "".join(t2s_to), "".join(s2t_from), "".join(s2t_to)


T2S_FROM, T2S_TO, S2T_FROM, S2T_TO = _build_alphabets()

# Simplified chars with SEVERAL traditional candidates in the char table,
# where first-wins ordering deliberately picks the default (發 for 发,
# 歷 for 历; the minority senses 髮/曆 are recovered by S2T_PHRASES).
# Any other conflicting duplicate is a table bug — caught at import below.
_INTENTIONAL_S2T_FANOUT = {"发", "历"}


def _audit_tables() -> None:
    """Fail fast at import if a duplicated table source maps to
    conflicting targets: first-wins dedup would silently shadow the later
    entry, so a conflicting duplicate is always an authoring mistake
    (except the explicit default-override chars above)."""
    from collections import defaultdict

    def check(pairs, label, exceptions=frozenset()):
        targets = defaultdict(set)
        for src, dst in pairs:
            targets[src].add(dst)
        bad = {
            s: ts
            for s, ts in targets.items()
            if len(ts) > 1 and s not in exceptions
        }
        if bad:
            raise AssertionError(
                f"{label}: duplicated sources with conflicting targets "
                f"(first-wins would shadow): {bad}"
            )

    check(_T2S_PAIRS + _T2S_ONLY_PAIRS, "t2s char table")
    check(
        [(s, t) for t, s in _S2T_ONLY_PAIRS + _T2S_PAIRS if t != s],
        "s2t char table",
        exceptions=_INTENTIONAL_S2T_FANOUT,
    )
    check(T2S_PHRASES, "T2S_PHRASES")
    check(S2T_PHRASES, "S2T_PHRASES")

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

# traditional word -> simplified word (t2s direction). Most t2s ambiguity
# is handled char-level (the collapse direction is safe); these cover the
# chars kept OUT of the t2s char table because even t2s needs context
# (乾 qián in era names, 藉 jí in 狼藉).
T2S_PHRASES: list[tuple[str, str]] = [
    ("乾燥", "干燥"), ("乾杯", "干杯"), ("乾淨", "干净"), ("餅乾", "饼干"),
    ("乾旱", "干旱"), ("乾脆", "干脆"), ("乾貨", "干货"), ("風乾", "风干"),
    ("乾洗", "干洗"), ("乾燥", "干燥"), ("晒乾", "晒干"), ("曬乾", "晒干"),
    ("幹部", "干部"), ("幹活", "干活"), ("能幹", "能干"),
    ("裡面", "里面"), ("裏面", "里面"), ("這裡", "这里"), ("那裡", "那里"),
    ("哪裡", "哪里"), ("後面", "后面"), ("以後", "以后"), ("之後", "之后"),
    ("最後", "最后"), ("後來", "后来"), ("麵條", "面条"), ("麵包", "面包"),
    # round-4: more 乾 words (the char stays out of the t2s table because
    # era names like 乾隆 keep 乾) and the 藉 pair
    ("乾糧", "干粮"), ("乾媽", "干妈"), ("乾爹", "干爹"),
    ("葡萄乾", "葡萄干"), ("豆腐乾", "豆腐干"), ("乾涸", "干涸"),
    ("乾枯", "干枯"), ("乾爽", "干爽"), ("擦乾", "擦干"),
    ("晾乾", "晾干"), ("烘乾", "烘干"), ("吹乾", "吹干"),
    ("藉口", "借口"), ("藉助", "借助"),
    # --- round-5 expansion (VERDICT r4 #5): the thin t2s side grown to
    # cover the genuinely t2s-ambiguous chars kept OUT of the char table
    # (乾 qián, 藉 jí, 著 zhù, 祇 qí, 瞭 liào, 摺/覆 partial collapses,
    # 甚 in 甚麼) — each convert-direction word spelled out; the
    # keep-traditional senses (乾隆/乾坤, 狼藉/慰藉, 著作/著名/土著,
    # 神祇, 瞭望/瞭哨, 覆蓋/顛覆) are protected by char-table ABSENCE.
    # 乾 gān words
    ("口乾", "口干"), ("乾嘔", "干呕"), ("乾笑", "干笑"),
    ("乾等", "干等"), ("乾瞪眼", "干瞪眼"), ("乾著急", "干着急"),
    ("乾巴巴", "干巴巴"), ("乾癟", "干瘪"), ("乾裂", "干裂"),
    ("乾冰", "干冰"), ("乾果", "干果"), ("乾草", "干草"),
    ("乾柴", "干柴"), ("乾貝", "干贝"), ("乾麵", "干面"),
    ("肉乾", "肉干"), ("魚乾", "鱼干"), ("筍乾", "笋干"),
    ("蘿蔔乾", "萝卜干"), ("梅乾", "梅干"), ("豆乾", "豆干"),
    ("蝦乾", "虾干"), ("杏乾", "杏干"), ("擰乾", "拧干"),
    ("榨乾", "榨干"), ("抽乾", "抽干"), ("吸乾", "吸干"),
    ("瀝乾", "沥干"), ("烤乾", "烤干"), ("陰乾", "阴干"),
    ("乾濕", "干湿"), ("外強中乾", "外强中干"),
    ("乾乾淨淨", "干干净净"),
    # 著 zhe/zháo/zhuó words -> 着 (著 zhù words keep 著 by absence)
    ("跟著", "跟着"), ("接著", "接着"), ("看著", "看着"),
    ("拿著", "拿着"), ("帶著", "带着"), ("等著", "等着"),
    ("沿著", "沿着"), ("朝著", "朝着"), ("向著", "向着"),
    ("隨著", "随着"), ("順著", "顺着"), ("靠著", "靠着"),
    ("對著", "对着"), ("照著", "照着"), ("穿著", "穿着"),
    ("衣著", "衣着"), ("活著", "活着"), ("笑著", "笑着"),
    ("哭著", "哭着"), ("坐著", "坐着"), ("站著", "站着"),
    ("躺著", "躺着"), ("睡著", "睡着"), ("忙著", "忙着"),
    ("急著", "急着"), ("意味著", "意味着"), ("著急", "着急"),
    ("著手", "着手"), ("著想", "着想"), ("著涼", "着凉"),
    ("著迷", "着迷"), ("著火", "着火"), ("著陸", "着陆"),
    ("著落", "着落"), ("著色", "着色"), ("著重", "着重"),
    ("著裝", "着装"), ("著實", "着实"), ("沉著", "沉着"),
    ("執著", "执着"), ("附著", "附着"), ("膠著", "胶着"),
    ("為著", "为着"), ("本著", "本着"), ("憑著", "凭着"),
    ("趁著", "趁着"), ("衝著", "冲着"), ("挨著", "挨着"),
    ("繞著", "绕着"), ("圍著", "围着"), ("抱著", "抱着"),
    ("提著", "提着"), ("牽著", "牵着"), ("騎著", "骑着"),
    ("開著", "开着"), ("關著", "关着"), ("留著", "留着"),
    ("藏著", "藏着"), ("躲著", "躲着"), ("盯著", "盯着"),
    ("望著", "望着"), ("聽著", "听着"), ("說著", "说着"),
    ("想著", "想着"), ("記著", "记着"), ("用不著", "用不着"),
    ("犯不著", "犯不着"), ("來著", "来着"),
    # 藉 jiè words -> 借 (狼藉/慰藉 keep 藉 by absence)
    ("憑藉", "凭借"), ("藉由", "借由"), ("藉故", "借故"),
    ("藉機", "借机"), ("藉著", "借着"), ("藉此", "借此"),
    ("藉題發揮", "借题发挥"),
    # 祇 qí-spelled adverb words -> 只 (神祇 keeps 祇 by absence)
    ("祇好", "只好"), ("祇有", "只有"), ("祇是", "只是"),
    ("祇要", "只要"), ("祇能", "只能"), ("祇不過", "只不过"),
    # 瞭 liǎo words -> 了 (瞭望/瞭哨 liào keep 瞭 by absence — this is
    # why 瞭 left the char table in round 5)
    ("瞭解", "了解"), ("明瞭", "明了"), ("一目瞭然", "一目了然"),
    ("瞭如指掌", "了如指掌"), ("瞭結", "了结"), ("瞭卻", "了却"),
    ("瞭斷", "了断"), ("瞭得", "了得"), ("瞭無", "了无"),
    # 摺 zhé words -> 折 (the chair/document senses all collapse)
    ("摺疊", "折叠"), ("存摺", "存折"), ("摺紙", "折纸"),
    ("奏摺", "奏折"), ("摺扇", "折扇"), ("摺痕", "折痕"),
    # 覆 reply-sense words -> 复 (覆蓋/顛覆/覆滅 keep 覆 by absence)
    ("答覆", "答复"), ("回覆", "回复"), ("覆命", "复命"),
    ("覆函", "复函"),
    # 甚麼 (variant spelling of 什麼)
    ("甚麼", "什么"), ("甚麽", "什么"),
]

# simplified word -> traditional word (s2t direction) — the direction
# where one simplified char fans out to several traditional chars and
# only the word decides (OpenCC STPhrases subset, high-frequency).
S2T_PHRASES: list[tuple[str, str]] = [
    # 发 -> 髮 (hair words; char default is 發)
    ("头发", "頭髮"), ("理发", "理髮"), ("假发", "假髮"), ("发型", "髮型"),
    ("发廊", "髮廊"), ("烫发", "燙髮"), ("染发", "染髮"), ("长发", "長髮"),
    ("短发", "短髮"), ("金发", "金髮"), ("白发", "白髮"), ("脱发", "脫髮"),
    ("毛发", "毛髮"), ("发夹", "髮夾"), ("发丝", "髮絲"),
    # 干 -> 乾 / 幹 (char default: leave 干 alone)
    ("干燥", "乾燥"), ("干杯", "乾杯"), ("干净", "乾淨"), ("饼干", "餅乾"),
    ("干旱", "乾旱"), ("干脆", "乾脆"), ("干货", "乾貨"), ("风干", "風乾"),
    ("干洗", "乾洗"), ("晒干", "曬乾"), ("干部", "幹部"), ("干活", "幹活"),
    ("能干", "能幹"), ("干线", "幹線"), ("干劲", "幹勁"), ("骨干", "骨幹"),
    ("干事", "幹事"), ("树干", "樹幹"), ("主干", "主幹"), ("苦干", "苦幹"),
    ("实干", "實幹"), ("干吗", "幹嗎"), ("干嘛", "幹嘛"),
    # 里 -> 裡 (char default: leave 里 alone — 公里/千里 stay)
    ("里面", "裡面"), ("这里", "這裡"), ("那里", "那裡"), ("哪里", "哪裡"),
    ("心里", "心裡"), ("家里", "家裡"), ("夜里", "夜裡"), ("手里", "手裡"),
    ("城里", "城裡"), ("里边", "裡邊"),
    # 后 -> 後 (char default: leave 后 alone — 皇后/太后 stay)
    ("后面", "後面"), ("以后", "以後"), ("之后", "之後"), ("最后", "最後"),
    ("后来", "後來"), ("然后", "然後"), ("前后", "前後"), ("后天", "後天"),
    ("后悔", "後悔"), ("落后", "落後"), ("后果", "後果"), ("后期", "後期"),
    ("背后", "背後"), ("今后", "今後"), ("随后", "隨後"), ("后退", "後退"),
    # 面 -> 麵 (char default: leave 面 alone)
    ("面条", "麵條"), ("面包", "麵包"), ("面粉", "麵粉"), ("泡面", "泡麵"),
    ("拉面", "拉麵"), ("炒面", "炒麵"),
    # 只 -> 隻 (classifier; char default: leave 只 alone)
    ("一只", "一隻"), ("几只", "幾隻"), ("两只", "兩隻"), ("三只", "三隻"),
    ("船只", "船隻"),
    # 松 -> 鬆 (char default: leave 松 alone — the tree)
    ("轻松", "輕鬆"), ("放松", "放鬆"), ("蓬松", "蓬鬆"), ("宽松", "寬鬆"),
    # 征 -> 徵 (char default: leave 征 alone — 征服/长征 stay)
    ("特征", "特徵"), ("征求", "徵求"), ("象征", "象徵"), ("征收", "徵收"),
    # 余 -> 餘 (char default: leave 余 alone — the surname stays)
    ("多余", "多餘"), ("其余", "其餘"), ("剩余", "剩餘"), ("业余", "業餘"),
    ("余额", "餘額"),
    # 志 -> 誌 (char default: leave 志 alone — 志愿/同志 stay)
    ("杂志", "雜誌"), ("标志", "標誌"), ("日志", "日誌"),
    # 系 -> 係 / 繫 (char default: leave 系 alone — 系统/院系 stay)
    ("关系", "關係"), ("联系", "聯繫"), ("维系", "維繫"),
    # 周 -> 週 (char default: leave 周 alone — the surname/周围 stay)
    ("周末", "週末"), ("周刊", "週刊"), ("周期", "週期"), ("周年", "週年"),
    # 斗 -> 鬥 (char default: leave 斗 alone — 北斗/漏斗 stay)
    ("战斗", "戰鬥"), ("斗争", "鬥爭"), ("奋斗", "奮鬥"), ("搏斗", "搏鬥"),
    # 伙 -> 夥 (char default: leave 伙 alone — 伙食 stays)
    ("伙伴", "夥伴"), ("大伙", "大夥"),
    # 制 -> 製 (char default: leave 制 alone — 制度/体制 stay)
    ("制造", "製造"), ("制作", "製作"), ("制品", "製品"), ("复制", "複製"),
    # 复 -> 複 (char default is 復 — 恢复/复习 work char-level)
    ("重复", "重複"), ("复杂", "複雜"), ("复印", "複印"), ("复数", "複數"),
    # 冲 -> 衝 (char default: leave 冲 alone? no — no s2t char entry;
    # 沖/衝 both need words)
    ("冲突", "衝突"), ("冲动", "衝動"), ("缓冲", "緩衝"), ("冲击", "衝擊"),
    ("冲洗", "沖洗"), ("冲泡", "沖泡"),
    # 胡 -> 鬍, 表 -> 錶, 汇 via char (匯)
    ("胡子", "鬍子"), ("胡须", "鬍鬚"), ("手表", "手錶"), ("钟表", "鐘錶"),
    # --- round-4 expansion (OpenCC STPhrases subset, continued) ---
    # 发 -> 髮 (more hair words; fixes the pinned 秀发 divergence)
    ("秀发", "秀髮"), ("黑发", "黑髮"), ("银发", "銀髮"),
    ("洗发", "洗髮"), ("护发", "護髮"), ("卷发", "捲髮"),
    ("发梢", "髮梢"), ("发际", "髮際"), ("披发", "披髮"),
    # 干 -> 幹 / 乾 (more; fixes the pinned 干流 divergence)
    ("干流", "幹流"), ("干道", "幹道"), ("干细胞", "幹細胞"),
    ("豆腐干", "豆腐乾"), ("干爽", "乾爽"), ("干枯", "乾枯"),
    ("晾干", "晾乾"), ("擦干", "擦乾"), ("烘干", "烘乾"),
    ("吹干", "吹乾"), ("干涸", "乾涸"), ("干粮", "乾糧"),
    ("干妈", "乾媽"), ("干爹", "乾爹"), ("葡萄干", "葡萄乾"),
    # 后 -> 後 (more)
    ("后方", "後方"), ("后卫", "後衛"), ("后门", "後門"),
    ("后院", "後院"), ("先后", "先後"), ("后续", "後續"),
    ("后者", "後者"), ("午后", "午後"), ("后遗症", "後遺症"),
    ("事后", "事後"), ("过后", "過後"), ("后勤", "後勤"),
    ("幕后", "幕後"), ("后排", "後排"), ("后座", "後座"),
    # 里 -> 裡 (more)
    ("里头", "裡頭"), ("屋里", "屋裡"), ("嘴里", "嘴裡"),
    ("眼里", "眼裡"), ("怀里", "懷裡"), ("被窝里", "被窩裡"),
    # 面 -> 麵 (more)
    ("面馆", "麵館"), ("方便面", "方便麵"), ("挂面", "掛麵"),
    ("面食", "麵食"), ("凉面", "涼麵"), ("面团", "麵糰"),
    # 游 -> 遊 (char default now keeps 游 — 游泳/上游 stay)
    ("旅游", "旅遊"), ("游戏", "遊戲"), ("游客", "遊客"),
    ("导游", "導遊"), ("游览", "遊覽"), ("游乐", "遊樂"),
    ("游行", "遊行"), ("游玩", "遊玩"), ("游荡", "遊蕩"),
    ("游艇", "遊艇"), ("郊游", "郊遊"), ("游子", "遊子"),
    # 表 -> 錶 (more timepieces)
    ("腕表", "腕錶"), ("表带", "錶帶"), ("秒表", "秒錶"),
    ("怀表", "懷錶"),
    # 谷 -> 穀 (grain; 山谷 stays)
    ("谷物", "穀物"), ("稻谷", "稻穀"), ("五谷", "五穀"),
    # 御 -> 禦 (defend; 御用 stays)
    ("防御", "防禦"), ("抵御", "抵禦"), ("御寒", "禦寒"),
    # 范 -> 範 (the surname stays)
    ("范围", "範圍"), ("模范", "模範"), ("规范", "規範"),
    ("示范", "示範"), ("师范", "師範"), ("范例", "範例"),
    ("典范", "典範"), ("防范", "防範"),
    # 历 -> 曆 (calendar; char default 歷 covers 历史)
    ("日历", "日曆"), ("农历", "農曆"), ("阳历", "陽曆"),
    ("挂历", "掛曆"), ("历法", "曆法"), ("公历", "公曆"),
    # 钟 -> 鍾 (char default 鐘 covers clocks)
    ("钟情", "鍾情"), ("钟爱", "鍾愛"),
    # 板 -> 闆
    ("老板", "老闆"),
    # 别 -> 彆
    ("别扭", "彆扭"),
    # 卜 -> 蔔 (占卜 stays)
    ("萝卜", "蘿蔔"),
    # 布 -> 佈 (cloth stays 布)
    ("宣布", "宣佈"), ("发布", "發佈"), ("分布", "分佈"),
    ("布置", "佈置"), ("布局", "佈局"), ("公布", "公佈"),
    ("颁布", "頒佈"), ("遍布", "遍佈"),
    # 采 -> 採 (风采 stays 采)
    ("采访", "採訪"), ("采用", "採用"), ("采取", "採取"),
    ("开采", "開採"), ("采购", "採購"), ("采集", "採集"),
    ("采纳", "採納"), ("采矿", "採礦"), ("采摘", "採摘"),
    # 淀 -> 澱 (海淀 stays)
    ("沉淀", "沉澱"), ("淀粉", "澱粉"),
    # 占 -> 佔 (占卜 stays)
    ("占领", "佔領"), ("占用", "佔用"), ("占据", "佔據"),
    ("占有", "佔有"), ("占比", "佔比"), ("抢占", "搶佔"),
    ("霸占", "霸佔"),
    # 向 -> 嚮
    ("向导", "嚮導"), ("向往", "嚮往"),
    # 郁 -> 鬱 (馥郁 stays)
    ("忧郁", "憂鬱"), ("抑郁", "抑鬱"), ("郁闷", "鬱悶"),
    ("郁郁葱葱", "鬱鬱蔥蔥"),
    # 舍 -> 捨 (宿舍 stays)
    ("舍得", "捨得"), ("舍弃", "捨棄"), ("取舍", "取捨"),
    ("舍不得", "捨不得"), ("施舍", "施捨"),
    # 尽 -> 儘 (char default 盡 covers 尽力/用尽)
    ("尽管", "儘管"), ("尽量", "儘量"), ("尽快", "儘快"),
    ("尽早", "儘早"), ("尽可能", "儘可能"),
    # 获 -> 穫 (char default 獲 covers 获得)
    ("收获", "收穫"),
    # 汇 -> 彙 (char default 匯 covers 汇款/外汇)
    ("词汇", "詞彙"), ("汇编", "彙編"), ("汇总", "彙總"),
    # 准 -> 準 (批准/准许 stay 准)
    ("标准", "標準"), ("准确", "準確"), ("准备", "準備"),
    ("水准", "水準"), ("瞄准", "瞄準"), ("准则", "準則"),
    ("准时", "準時"), ("精准", "精準"),
    # 咸 -> 鹹 (咸丰 stays)
    ("咸菜", "鹹菜"), ("咸鱼", "鹹魚"), ("咸味", "鹹味"),
    # 丑 -> 醜 (小丑/丑角 stay 丑)
    ("丑陋", "醜陋"), ("丑闻", "醜聞"), ("出丑", "出醜"),
    # 松 -> 鬆 (more; the tree stays)
    ("松散", "鬆散"), ("松开", "鬆開"), ("松弛", "鬆弛"),
    ("松动", "鬆動"),
    # 了 -> 瞭 (liǎo-understand words; the particle stays)
    # (了望 — the deprecated PRC spelling of 瞭望 — is deliberately NOT
    # mapped: 瞭望 is t2s-protected since round 5, so mapping 了望 onto
    # it would break t2s∘s2t cycle closure; the standard spelling is
    # 瞭望 in BOTH scripts and passes through unchanged.)
    ("了解", "瞭解"),
    # 回 -> 迴
    ("回避", "迴避"), ("迂回", "迂迴"), ("回廊", "迴廊"),
    # 奸 -> 姦 (奸商/汉奸 stay 奸)
    ("强奸", "強姦"), ("通奸", "通姦"),
    # 脏 -> 髒 (char default 臟 covers 心脏)
    ("肮脏", "骯髒"), ("脏话", "髒話"), ("脏乱", "髒亂"),
    ("脏水", "髒水"),
    # 须 -> 鬚 (char default 須 covers 必须)
    ("触须", "觸鬚"), ("胡须", "鬍鬚"), ("须发", "鬚髮"),
    # 秋 -> 鞦 (swing; the season stays)
    ("秋千", "鞦韆"),
    # 签 -> 籤 (char default 簽 covers 签名/签字)
    ("牙签", "牙籤"), ("书签", "書籤"), ("标签", "標籤"),
    ("抽签", "抽籤"), ("求签", "求籤"),
    # 帘 -> 簾
    ("窗帘", "窗簾"), ("门帘", "門簾"), ("帘子", "簾子"),
    # 冲 more
    ("冲刺", "衝刺"), ("冲锋", "衝鋒"), ("冲浪", "衝浪"),
    ("冲凉", "沖涼"), ("冲澡", "沖澡"), ("首当其冲", "首當其衝"),
    # 台 -> 颱/檯 (char default 臺; typhoon and tabletop differ)
    ("台风", "颱風"), ("台面", "檯面"), ("台灯", "檯燈"),
    ("吧台", "吧檯"), ("柜台", "櫃檯"), ("写字台", "寫字檯"),
    # 只 -> 隻 (more classifiers)
    ("只身", "隻身"), ("形单影只", "形單影隻"),
    # 系 more
    ("系上", "繫上"), ("系鞋带", "繫鞋帶"),
    # 周 more
    ("周岁", "週歲"), ("周报", "週報"), ("下周", "下週"),
    ("上周", "上週"), ("每周", "每週"), ("周一", "週一"),
    ("周二", "週二"), ("周三", "週三"), ("周四", "週四"),
    ("周五", "週五"), ("周六", "週六"), ("周日", "週日"),
    # round-5 probe-found gaps (tests/test_zh_backfill.py envelope)
    ("一周", "一週"), ("两周", "兩週"), ("本周", "本週"),
    ("周转", "週轉"), ("往后", "往後"), ("后代", "後代"),
    ("汤面", "湯麵"), ("凉面", "涼麵"), ("方便面", "方便麵"),
    # 梁 -> 樑 (structural-beam words; the surname/place name stays 梁)
    ("桥梁", "橋樑"), ("栋梁", "棟樑"), ("房梁", "房樑"),
    ("顶梁柱", "頂樑柱"), ("梁柱", "樑柱"),
    # 沈 -> 瀋 only in the city name (the surname stays 沈)
    ("沈阳", "瀋陽"),
    # 迹 -> 蹟 / 跡 (word decides; the char is t2s-only for this reason)
    ("古迹", "古蹟"), ("奇迹", "奇蹟"), ("事迹", "事蹟"),
    ("遗迹", "遺蹟"), ("痕迹", "痕跡"), ("足迹", "足跡"),
    ("踪迹", "蹤跡"), ("轨迹", "軌跡"), ("迹象", "跡象"),
    ("笔迹", "筆跡"), ("血迹", "血跡"), ("绝迹", "絕跡"),
    ("销声匿迹", "銷聲匿跡"),
    # 志 more
    ("墓志铭", "墓誌銘"),
    # 余 more
    ("余地", "餘地"), ("余生", "餘生"), ("余震", "餘震"),
    ("结余", "結餘"), ("盈余", "盈餘"),
    # 征 more
    ("应征", "應徵"), ("征兆", "徵兆"), ("征文", "徵文"),
    ("征稿", "徵稿"), ("征信", "徵信"),
    # 托 -> 託 (char keeps 托 — 托运 needs 託)
    ("委托", "委託"), ("托运", "託運"), ("拜托", "拜託"),
    ("信托", "信託"), ("托付", "託付"),
    # 欲 -> 慾 (desire-noun words; the auxiliary stays 欲)
    ("食欲", "食慾"), ("性欲", "性慾"), ("欲望", "慾望"),
    # 仑 -> 崙
    ("昆仑", "崑崙"),
]

_audit_tables()


def _phrase_order(pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Longest source first (stable) — identical ordering on both engines."""
    return sorted(pairs, key=lambda p: (-len(p[0]), p[0]))


# The phrase pre-pass is a fold over the (src, dst) pair list. With ~350
# pairs, a chain of nested F.replace() column nodes overflows the JVM
# stack during column-node→expression conversion (StackOverflowError at
# ~300 nodes, measured on Spark 4.1), so the fold is expressed as ONE
# ``aggregate`` (reduce) higher-order function over an array literal of
# separator-joined pairs — expression depth O(1), width O(n). The DuckDB
# twin is ``list_reduce`` with ``list_prepend`` seeding the accumulator.
# Round-5 cost control (measured at sf0.1 on local[32]): a phrase can
# only match if one of the ~100 distinct source FIRST chars occurs in
# the value, and ``length(translate(x, first_chars, '')) < length(x)``
# detects that in one codegen'd pass (an rlike char-class gate costs
# ~1 s by itself at this scale), so rows with no candidate char skip the
# interpreted HOF entirely: 3.10 -> 0.35 s folding S2T_PHRASES over the
# 5k sf0.1 document texts; the all-Chinese zh_backfill name path is
# unchanged (~0.85 s, every row passes the gate). The input is bound
# ONCE through a single-element ``transform`` lambda so a complex input
# expression (the back-fill's coalesce/is_han chain, inlined by
# projection collapse) is evaluated once, not once per gate reference.
# (An array-of-structs pair literal that removes the per-pair
# split_parts benched 2.9x FASTER standalone but 3x SLOWER inside the
# back-fill plan — kept the split_part form, which is flat in both.)
_PAIR_SEP = "\x01"


def _phrase_fold(c: Column, pairs: list[tuple[str, str]]) -> Column:
    ordered = _phrase_order(pairs)
    arr = F.array(
        *[F.lit(f"{src}{_PAIR_SEP}{dst}") for src, dst in ordered]
    )
    first_chars = "".join(sorted({src[0] for src, _ in ordered}))

    def convert(x: Column) -> Column:
        folded = F.aggregate(
            arr,
            x,
            lambda acc, p: F.replace(
                acc,
                F.split_part(p, F.lit(_PAIR_SEP), F.lit(1)),
                F.split_part(p, F.lit(_PAIR_SEP), F.lit(2)),
            ),
        )
        may_match = F.length(F.translate(x, first_chars, "")) < F.length(x)
        return F.when(may_match, folded).otherwise(x)

    return F.transform(F.array(c), convert)[0]


def _phrase_fold_sql(expr: str, pairs: list[tuple[str, str]]) -> str:
    lits = ", ".join(
        "'" + f"{src}{_PAIR_SEP}{dst}".replace("'", "''") + "'"
        for src, dst in _phrase_order(pairs)
    )
    return (
        f"list_reduce(list_prepend(CAST({expr} AS VARCHAR), [{lits}]), "
        "(acc, p) -> replace(acc, split_part(p, chr(1), 1), "
        "split_part(p, chr(1), 2)))"
    )


def is_han(col: Column | str) -> Column:
    """True iff the string contains at least one Han-script codepoint.

    Parity target: OMTZHModifier.java:247-250 (Character.UnicodeScript.HAN
    over codepoints). ``rlike`` with ``\\p{IsHan}`` is evaluated by Java
    regex per-codepoint, so CJK Extension B+ (non-BMP) matches too.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(HAN_REGEX)


def to_simplified(col: Column | str) -> Column:
    """Traditional → Simplified: word-level phrase fold (reduce HOF),
    then char-level translate (see module docstring and _phrase_fold)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(_phrase_fold(c, T2S_PHRASES), T2S_FROM, T2S_TO)


def to_traditional(col: Column | str) -> Column:
    """Simplified → Traditional: word-level phrase fold (reduce HOF),
    then char-level translate (see module docstring and _phrase_fold)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(_phrase_fold(c, S2T_PHRASES), S2T_FROM, S2T_TO)


def to_simplified_sql(expr: str) -> str:
    """DuckDB SQL with the IDENTICAL phrase fold + translate as
    :func:`to_simplified` — the oracle twin."""
    out = _phrase_fold_sql(expr, T2S_PHRASES)
    return f"translate({out}, '{T2S_FROM}', '{T2S_TO}')"


def to_traditional_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`to_traditional`."""
    out = _phrase_fold_sql(expr, S2T_PHRASES)
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
