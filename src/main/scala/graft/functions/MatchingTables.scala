package graft.functions

/** Curated French-catalogue matching tables, imported wholesale from
  * the reference (script/tables/matching.py — names :12, comp_names
  * :50, status :85, functions :137, rgx_roman :184, dpts :190,
  * provinces :330, colonies :368, countries :433, events :478, other
  * :495; public GPL data). Only the linguistic DATA is imported — the
  * matching mechanism (broadcast literal maps, codegen'd rule
  * cascades) is the Spark-native implementation in NameFunctions.
  * Provenance and licensing: see the repository LICENSE file — the
  * imported tables are GPL-3.0 and the repo is distributed under
  * GPL-3.0 accordingly.
  */
object MatchingTables {

  /** abbreviation → full first name, applied to trait/parenthetical tokens. */
  val names: Map[String, String] = Map(
    "ad" -> "adam",
    "alex" -> "alexandre",
    "alph" -> "alphonse",
    "ant" -> "antoine",
    "arm" -> "armand",
    "aug" -> "auguste",
    "ch" -> "charles",
    "cl" -> "claude",
    "dom" -> "dominique",
    "emm" -> "emmanuel",
    "ed" -> "edouard",
    "et" -> "etienne",
    "ét" -> "etienne",
    "ferd" -> "ferdinand",
    "fred" -> "frederic",
    "fr" -> "françois",
    "franc" -> "françois",
    "franç" -> "françois",
    "fréd" -> "frédéric",
    "g" -> "guillaume",
    "guill" -> "guillaume",
    "gab" -> "gabriel",
    "jh" -> "joseph",
    "jacq" -> "jacques",
    "jos" -> "joseph",
    "math" -> "matthieu",
    "nic" -> "nicolas",
    "ph" -> "philippe",
    "v" -> "victor",
    "vr" -> "victor")

  /** composed-name abbreviation → full form; queried before
    * initial-by-initial expansion since a composed name gives context. */
  val compNames: Map[String, String] = Map(
    "arm ch" -> "armand-charles",
    "ch m" -> "charles-marie",
    "ch l f" -> "charles-louis-françois",
    "f m" -> "francois-marie",
    "fr emm." -> "françois-emmanuel",
    "j ant" -> "jean-antoine",
    "j f" -> "jean-francois",
    "j m" -> "jean-marie",
    "j j" -> "jean-jacques",
    "j l" -> "jean-louis",
    "j b" -> "jean-baptiste",
    "j p" -> "jean-pierre",
    "j pierre" -> "jean-pierre",
    "l f" -> "louis-françois",
    "m f" -> "marius-felix",
    "franc rené" -> "francois-rené",
    "m madeleine" -> "marie-madeleine",
    "ph h" -> "philippe henri",
    "p aug" -> "pierre auguste",
    "p alex" -> "pierre alexandre",
    "p j" -> "pierre-jean",
    "j sylvain" -> "jean-sylvain",
    "l ph" -> "louis-philippe",
    "edm ch" -> "edmond-charles",
    "ch marie" -> "charles-marie")

  /** nobility/clerical titles found in tei:name → wikidata term
    * ("" = recognized but untranslated: strip from the name, emit nothing). */
  val status: Map[String, String] = Map(
    "empereur" -> "",
    "impératrice" -> "",
    "géneral" -> "general",
    "reine" -> "queen",
    "roi" -> "king",
    "princesse" -> "princess",
    "prince" -> "prince",
    "archiduchesse" -> "",
    "archiduc" -> "",
    "duchesse" -> "duchess",
    "duc" -> "duke",
    "famille" -> "family",
    "seigneur" -> "",
    "vicomtesse" -> "",
    "victesse" -> "",
    "vicomte" -> "",
    "victe" -> "",
    "comtesse palatine" -> "countess palatine",
    "comtesse" -> "",
    "ctesse" -> "",
    "comte" -> "",
    "cte" -> "",
    "cardinal" -> "",
    "pape" -> "pope",
    "lord" -> "",
    "chevalier" -> "",
    "marquise" -> "",
    "marquis" -> "",
    "sire" -> "",
    "baronnesse" -> "",
    "baronne" -> "",
    "baron" -> "",
    "abbé" -> "",
    "madame" -> "",
    "mme" -> "",
    "monsieur" -> "",
    "mr" -> "",
    "docteur" -> "",
    "maréchale" -> "",
    "maréchal" -> "",
    "mademoiselle" -> "",
    "melle" -> "",
    "mlle" -> "",
    "sir" -> "")

  /** occupation terms found in tei:trait → wikidata occupation. */
  val functions: Map[String, String] = Map(
    "général" -> "general",
    "maréchal" -> "marshal",
    "lieutenant" -> "military",
    "officier" -> "military",
    "colonel" -> "military",
    "lieutenant-colonel" -> "military",
    "commandant" -> "military",
    "capitaine" -> "military",
    "roi" -> "king",
    "empereur" -> "emperor",
    "president" -> "president",
    "homme politique" -> "politician",
    "président de l'assemblée" -> "politician",
    "orateur" -> "politician",
    "député" -> "politician",
    "secrétaire d'état" -> "politician",
    "sénateur" -> "politician",
    "écrivain" -> "writer",
    "auteur" -> "writer",
    "romancier" -> "writer",
    "acteur" -> "actor",
    "actrice" -> "actress",
    "cantatrice" -> "singer",
    "chanteur" -> "singer",
    "chanteuse" -> "singer",
    "peintre" -> "painter",
    "sculpteur" -> "sculptor",
    "statutaire" -> "sculptor",
    "compositeur" -> "composer",
    "musicien" -> "musician",
    "musicienne" -> "musician",
    "tragédien" -> "actor",
    "chansonnier" -> "chansonnier",
    "achitecte" -> "architect",
    "journaliste" -> "journalist",
    "inventeur" -> "inventor",
    "chimiste" -> "chemist",
    "connétable" -> "constable",
    "archevêque" -> "archbishop",
    "évêque" -> "bishop",
    "docteur" -> "physicist",
    "médecin" -> "physicist")

  /** roman numerals + french ordinal suffixes ("Ier", "IIIème", ...). */
  val rgxRoman: String = "(^|\\s)((I|V|X|D|C|M)+)(er|ère|ere|ème|eme|nd|nde)?(\\s|$)"

  /** french departments (1790 ∪ 1811 lists). */
  val dpts: Seq[String] = Seq(
    "ain", "aisne", "allier", "basses-alpes", "hautes-alpes",
    "alpes-maritimes", "annepins", "provence", "ardèche", "ardennes",
    "arriège", "arno", "aube", "aude", "aveyron", "bouches-de-l'elbe",
    "bouches-de-l'escaut", "bouches-de-l'yssel", "bpuches-de-la-meuse",
    "bouches-du-rhin", "bouches-du-rhône", "bouches-du-weser", "calvados",
    "cantal", "charente", "charente-inférieure", "cher", "corrèze", "corse",
    "côte-d'or", "côtes-du-nord", "creuse", "deux-nèthes", "deux-sèvres",
    "doire", "dordogne", "doubs", "drôme", "dyle", "ems-occidental",
    "ems-oriental", "ems-supérieur", "escaut", "eure", "eure-et-loir",
    "finistère", "forêts", "gard", "haute-garonne", "gers", "gironde",
    "hérault", "ille-et-villaine", "indre", "indre-et-loire", "isère",
    "jemappes", "jura", "landes", "léman", "loire", "loir-et-cher",
    "haute-loire", "loire-inférieure", "loiret", "lot", "lot-et-garonne",
    "lozère", "lys", "maine-et-loire", "manche", "marengo", "marne",
    "haute-marne", "méditerrannée", "mayenne", "meurthe", "meuse",
    "meuse-inférieure", "mont-blanc", "mont-tonnerre", "montenotte",
    "morbihan", "meuse", "moselle", "nièvre", "nord", "oise", "ombrone",
    "orne", "ourte", "paris", "pas-de-calais", "pô", "puy-de-dôme",
    "hautes-pyrénées", "basses-pyrénées", "pyrénées-orientales", "haut-rhin",
    "bas-rhin", "rhin-et-moselle", "rhône", "rhône-et-loire", "roer", "rome",
    "haute-saône", "saône-et-loire", "sambre-et-meuse", "sarre", "sarthe",
    "seine", "seine-et-marne", "seine-et-oise", "seine-inférieure", "sézia",
    "simplon", "deux-sèvres", "somme", "stura", "tarn", "tarn-et-garonne",
    "taro", "trasimène", "var", "vaucluse", "vendée", "vienne",
    "haute-vienne", "vosges", "yonne", "yssel-supérieur", "zuyderzée")

  /** pre-revolution provinces. */
  val provinces: Seq[String] = Seq(
    "armagnac", "île-de-france", "berry", "orléanais", "normandie",
    "languedoc", "lyonnais", "dauphiné", "champagne", "aunis", "saintonge",
    "poitou", "guyenne et gascogne", "bourgogne", "picardie", "anjou",
    "provence", "angoumois", "bourbonnais", "marche", "bretagne", "maine",
    "touraine", "limousin", "comté de foix", "auvergne", "béarn", "alsace",
    "artois", "roussillon", "flandre française et hainaut français",
    "franche-comté", "lorraine et trois-évêchés", "corse", "nivernais")

  /** french colonies, with alternate/old orthographs. */
  val colonies: Seq[String] = Seq(
    "québec", "ontario", "saint-pierre-et-miquelon", "mississippi",
    "missouri", "louisiane", "anguilla", "antigua", "dominique",
    "saint-domingue", "guadeloupe", "monsterrat", "saint-martin",
    "saint-barthélémy", "sainte-lucy", "saint-vincent-et-les-grenadines",
    "saint-eustache", "saint-christophe", "martiniqueguyane française",
    "guyane", "maroc", "algérie", "algérie française", "tunisie", "fezzan",
    "dahomey", "haute-volta", "oubangui-chari", "congo français",
    "moyen-congo", "guinée française", "soudan français", "gorée", "tigi",
    "djibouti", "cheikh saïd", "comores", "fort-dauphin", "îles maurice",
    "mayotte", "la réunion", "îles éparses", "île amsterdam",
    "île saint-paul", "archipel crozet", "îles kerguelen", "castellorizo",
    "grand-liban", "sandjak d'alexandrette", "indes françaises",
    "pondichéry", "karikal", "yanaon", "mahé", "chanderngor", "tonkin",
    "annam", "cochinchine", "guangzhou wan", "shanghai", "guangzhou",
    "tianjin", "hankou", "clipperton", "nouvelle-calédonie",
    "polynésie française", "vanuatu", "nouvelles-hébrides",
    "wallis et futuna")

  /** country name (fr) → wikidata label (en). */
  val countries: Map[String, String] = Map(
    "états-unis d'amérique" -> "united states of america",
    "etats-unis d'amérique" -> "united states of america",
    "états unis d'amérique" -> "united states of america",
    "etats unis d'amerique" -> "united states of america",
    "états-unis" -> "united states of america",
    "etats-unis" -> "united states of america",
    "etats unis" -> "united states of america",
    "états unis" -> "united states of america",
    "italie" -> "italy",
    "grèce" -> "greece",
    "canada" -> "canada",
    "chine" -> "china",
    "haïti" -> "haiti",
    "tobago" -> "tobago",
    "brésil" -> "brasil",
    "burkina-faso" -> "burkina-faso",
    "cameroun" -> "cameroun",
    "tchad" -> "tchad",
    "congo" -> "congo",
    "gabon" -> "gabon",
    "guinée" -> "guinea",
    "côte d'ivoire" -> "ivory coast",
    "mali" -> "mali",
    "mauritanie" -> "mauritania",
    "niger" -> "niger",
    "sénégal" -> "senegal",
    "madagascar" -> "madagascar",
    "seychelles" -> "seychelles",
    "tanzanie" -> "tanzania",
    "zanzibar" -> "zanzibar",
    "liban" -> "lebanon",
    "syrie" -> "syria",
    "inde" -> "india",
    "laos" -> "laos",
    "viet-nâm" -> "vietnam")

  /** historical-event phrase → wikidata query string. */
  val events: Map[String, String] = Map(
    "défense nationale" -> "government of national defense",
    "defense nationale" -> "government of national defense",
    "révolution française" -> "french revolution",
    "revolution francaise" -> "french revolution",
    "guerre de trente ans" -> "thirty years' war 1618 1648",
    "guerre de cent ans" -> "hundred years' war 1337 1453",
    "guerre de sept ans" -> "seven years war 1756 1763",
    "guerre" -> "war",
    "insurrection" -> "war",
    "siège de mayence" -> "siege of mainz",
    "siège" -> "siege",
    "commune" -> "commune",
    "défense" -> "battle",
    "révolution" -> "revolution")

  /** notable places that are neither geo nor person. */
  val other: Map[String, String] = Map(
    "louvre" -> "louvre",
    "arc de triomphe du carrousel" -> "arc de triomphe du carrousel",
    "université" -> "university")
}
