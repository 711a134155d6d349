"""Indexing pipeline stage 1: file enumeration + per-file entity extraction.

Reference mapping (SURVEY §2.9):
- D1 two-stage async pipeline (tokio IO → rayon parse, indexer.rs:218-371) →
  Spark's own partition parallelism: an Arrow-batched ``mapInPandas`` read
  is the IO stage, the extraction ``mapInPandas`` the CPU stage. No manual
  semaphores — backpressure is the scheduler's.
- S1 repo enumeration w/ ignore rules (project/source.rs:28-90) →
  driver-side metadata walk (Spark's own file sources hide ``_``/``.``
  prefixed names — they would drop every ``__init__.py``) + Catalyst
  gitignore predicate.
- S2 bounded read, 5 MB max (project/io.rs:15-40, indexer.rs:64-71) →
  ``os.stat`` size check at enumeration; oversized files are never opened.
- D2 per-file parse → definitions/imports/call-sites
  (parsing/processor.rs:179-250). The reference uses tree-sitter; this
  container has no parser libs, so extraction is a regex/indentation
  analyzer for Python/Ruby/TypeScript — same output contract
  (kind, name, parent chain, line/col/byte ranges), swappable for
  py-tree-sitter behind the same mapInPandas signature.

The extractor emits one long-format DataFrame (entity kind discriminator);
stage 2 (build.py) splits and joins it into the graph tables.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LANGUAGE_BY_EXTENSION = {
    "py": "Python",
    "rb": "Ruby",
    "ts": "TypeScript",
    "tsx": "TypeScript",
    "js": "TypeScript",
    "java": "Java",
    "kt": "Kotlin",
    "cs": "CSharp",
    "rs": "Rust",
}

DEFAULT_MAX_FILE_SIZE = 5_000_000  # indexer.rs:64-71
_IGNORED_SEGMENTS = (".git", "node_modules", "__pycache__", "target", ".venv", "vendor")

# One row per extracted entity; ``kind`` ∈ {definition, import, call, inherits}
# receiver_type/call_flavor carry receiver-typed call info (Ruby/Java):
# receiver_type = resolved constant/class name of the receiver expression,
# call_flavor ∈ {singleton, instance} — mirroring the reference's
# expression-resolver output (ruby/expression_resolver.rs, the class-method
# vs instance-method lookup split in scope_resolver.rs:155-175).
ENTITY_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("language", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("name", StringType(), True),
        StructField("parent_chain", StringType(), True),  # dotted enclosing defs
        StructField("definition_type", StringType(), True),
        StructField("import_path", StringType(), True),
        StructField("alias", StringType(), True),
        StructField("start_line", IntegerType(), True),
        StructField("end_line", IntegerType(), True),
        StructField("start_col", IntegerType(), True),
        StructField("end_col", IntegerType(), True),
        StructField("start_byte", LongType(), True),
        StructField("end_byte", LongType(), True),
        StructField("receiver_type", StringType(), True),
        StructField("call_flavor", StringType(), True),
        # extension-member typing (Kotlin): on a definition row,
        # receiver_type holds the extension receiver (`fun ExtendMe.f()` →
        # ExtendMe); on a kind="ext_member" row, member_type holds the
        # member's inferred result type so the build can hop
        # `x.prop.method()` through the property's type
        # (kotlin/tests.rs:482-553, extension functions + properties)
        StructField("member_type", StringType(), True),
    ]
)

_PY_DEF = re.compile(r"^(\s*)(?:async\s+)?(def|class)\s+([A-Za-z_][A-Za-z0-9_]*)")
# `from` clause accepts leading dots (relative imports: `from .foo import x`,
# `from .. import y`) — interfile.rs:48-96 resolves them against the
# importing file's package; the dots are preserved in import_path so the
# build-stage candidate join can count them.
_PY_IMPORT = re.compile(
    r"^\s*(?:from\s+(\.+[\w.]*|[A-Za-z_][\w.]*)\s+import\s+([A-Za-z_*][\w]*(?:\s*,\s*[\w]+)*)(?:\s+as\s+(\w+))?"
    r"|import\s+([A-Za-z_][\w.]*)(?:\s+as\s+(\w+))?)"
)
# `from X import (` — parenthesized name list, usually spanning lines; the
# names are collected up to the closing paren with per-name `as` aliases
_PY_IMPORT_OPEN = re.compile(r"^\s*from\s+(\.+[\w.]*|[A-Za-z_][\w.]*)\s+import\s*\(")
# setter defs (`def width=(w)`) index under their Ruby method name `width=`:
# tree-sitter-ruby's `method` node names a setter via a `setter` node whose
# text INCLUDES the `=` (grammar: setter := identifier "="), and Ruby itself
# defines the method as :width= — the `=` is captured only when directly
# attached (an endless `def answer = 42` has a space before `=`, no match)
_RB_DEF = re.compile(
    r"^(\s*)(def|class|module)\s+(self\.)?([A-Za-z_][A-Za-z0-9_?!]*=?(?![=~>]))"
)
# endless method (`def square(x) = x * x` / `def answer = 42`): a complete
# one-line definition — it must NOT open a scope frame, or the next def
# nests under it. Parenless defs with default args (`def f a, b = {}`) and
# setters (`def width=(w)`) don't match: the `=` must directly follow the
# closed parens or the bare name.
_RB_ENDLESS = re.compile(
    r"^\s*def\s+(?:self\.)?[A-Za-z_][A-Za-z0-9_?!]*(?:\([^)]*\)\s*|\s+)=\s*[^=\s]"
)
# `class << self` opens the singleton class: a TRANSPARENT scope frame —
# contributes no FQN segment, and defs inside are singleton methods of the
# enclosing class (ruby/scope_resolver.rs:49-53 — "defined with `self.` or
# in the class's singleton class")
_RB_SCLASS = re.compile(r"^(\s*)class\s*<<\s*self\b")
_RB_IMPORT = re.compile(r"^\s*require(?:_relative)?\s+['\"]([^'\"]+)['\"]")
# `class Foo < Bar` superclass clause — feeds the inheritance chain the
# reference keeps for method lookup (ruby/scope_resolver.rs:57-63,142-149)
_RB_INHERIT = re.compile(r"<\s*([A-Z][\w:]*)")
# receiver-dot-method, parens optional (Ruby calls are parenless-friendly):
# group 1 = receiver expression (Const / Const::Path / local / @ivar)
_RB_RECV_CALL = re.compile(r"(@?[A-Za-z_]\w*(?:::\w+)*)\.([a-z_]\w*[?!]?)")
# local / ivar assignments whose RHS names a constant constructor-ish call:
# the var's type is the constant (user = User.new → user : User), the same
# local-type inference the reference's expression resolver performs
_RB_LOCAL_ASSIGN = re.compile(
    r"^\s*([a-z_]\w*)\s*=\s*([A-Z]\w*(?:::\w+)*)\.(?:new|create\w*|find\w*|build\w*)\b"
)
_RB_IVAR_ASSIGN = re.compile(
    r"^\s*@(\w+)\s*=\s*([A-Z]\w*(?:::\w+)*)\.(?:new|create\w*|find\w*|build\w*)\b"
)
# assignment whose RHS is a single bare (parenless) identifier — in Ruby that
# is a method call on self unless the name is a known local variable
# (`profile = get_profile` calls the enclosing class's get_profile;
# ruby/tests.rs:939-961 test_ruby_conditional_method_calls asserts the edge)
_RB_BARE_RHS = re.compile(r"^\s*@?\w+\s*=\s*([a-z_]\w*[?!]?)\s*$")
# any plain `name = …` marks `name` as a local, suppressing the bare-RHS
# call rule for later `x = name` lines in the same method
_RB_ANY_LOCAL = re.compile(r"^\s*([a-z_]\w*)\s*=[^=]")
# RHS names that are literals/receivers, never self-calls
_RB_BARE_NOISE = {"true", "false", "nil", "self"}
_JAVA_PKG = re.compile(r"^\s*package\s+([\w.]+)\s*;")
# `Type name = ...` / `private Type name;` declarations give locals and
# fields their static type (generics stripped)
_JAVA_VAR_DECL = re.compile(
    r"^\s*(?:(?:public|private|protected|final|static|var|readonly|internal"
    r"|volatile|transient)\s+)*"
    r"([A-Z][\w]*)(?:<[^>]*>)?\s+([_a-z]\w*)\s*[=;]"
)
_JV_RECV_CALL = re.compile(r"([A-Za-z_$][\w$]*)\.([a-z]\w*)\s*\(")
# `new Outer.Inner()` / `new ArrayList<String>()` — constructor calls the
# bare-call regex misses (dotted prefix, generic argument list); the call
# target is the CLASS, as in the reference's constructor resolution
_JV_NEW = re.compile(
    r"\bnew\s+([A-Z][\w$]*(?:\s*\.\s*[A-Z][\w$]*)*)\s*(?:<[^>()]*>)?\s*\("
)
_TS_DEF = re.compile(
    r"^(\s*)(?:export\s+)?(?:default\s+)?(?:declare\s+)?(?:abstract\s+)?(?:async\s+)?"
    r"(?:const\s+)?"  # `const enum Dir {` — still an enum_declaration
    r"(function|class|interface|namespace|module|enum)\s+([A-Za-z_$][\w$]*)"
)
# ambient module with a STRING name (`declare module "pkg" {`): identifier
# form is covered by _TS_DEF; match ends right after the opening quote so the
# caller can read the name from the string-intact import view.
_TS_AMBIENT_MODULE = re.compile(r'^(\s*)(?:export\s+)?declare\s+(?:module|namespace)\s+"')
# class-body member: optional modifiers, optional get/set, name immediately
# followed by '(' and an opening brace ending the line. Only consulted when
# the innermost scope frame is a class/interface (guards against top-level
# control flow and call statements). Matches the reference's tree-sitter
# method_definition inventory on fixtures/typescript/test-repo: 84 total
# definitions = classes + interfaces + functions + methods/ctors/accessors,
# NO fields/consts (tests.rs:369-454 asserts 84 global / 32 in the models)
_TS_METHOD = re.compile(
    # body brace need not end the line: `render(): void {}` and
    # `get x() { return this._x; }` are method_definition nodes too —
    # class/interface bodies host only members, so a `name(...) ... {`
    # line inside one is a method regardless of what follows the brace
    # (the innermost-frame guard + keyword guard exclude control flow)
    r"^(\s*)(?:(?:public|private|protected|static|readonly|override|abstract|async)\s+)*"
    # generator methods (`*gen() {`) are method_definition nodes too
    r"(?:(get|set)\s+)?(?:\*\s*)?([A-Za-z_$][\w$]*)\s*\(.*\{"
)
# method HEAD without the body brace: params still open at EOL, or closed
# with an optional return type — the `{` arrives on a continuation line
# (multi-line signatures / Allman braces). Confirmed against the next few
# masked lines before emitting.
_TS_METHOD_HEAD = re.compile(
    r"^(\s*)(?:(?:public|private|protected|static|readonly|override|abstract|async)\s+)*"
    r"(?:(get|set)\s+)?(?:\*\s*)?([A-Za-z_$][\w$]*)\s*\((?:[^)]*\)\s*(?::[^={;]*)?)?\s*$"
)
_TS_METHOD_CONT = re.compile(r"\)\s*(?::[^={;]*)?\s*\{")
# `class Foo extends Bar` superclass clause → inheritance-chain entry, the
# same chain-climbing method lookup as Ruby (`UserModel.create` resolving to
# BaseModel.create in the reference's TS fixture)
_TS_EXTENDS = re.compile(r"\bextends\s+([A-Za-z_$][\w$.]*)")
# receiver-dot-method with call parens; receiver may be a dotted path
# (`UserManagement.User.findByUsername`) — resolution uses the last segment
_TS_RECV_CALL = re.compile(
    r"((?:[A-Za-z_$][\w$]*\.)*[A-Za-z_$][\w$]*)\.([A-Za-z_$][\w$]*)\s*\("
)
# const/let/var whose RHS names a constructor or factory-ish static call:
# the local's type is the constant (user = UserModel.create(...) → UserModel)
_TS_LOCAL_ASSIGN = re.compile(
    r"^\s*(?:const|let|var)\s+([A-Za-z_$][\w$]*)\s*=\s*"
    r"(?:new\s+([A-Z][\w$.]*)|([A-Z][\w$.]*)\.(?:create|find\w*|build\w*)\b)"
)
# class field with a type annotation (`private users: UserModel[] = []`) —
# gives `this.users`-style receivers their declared type
_TS_FIELD_TYPE = re.compile(
    # modifiers optional: `svc: Svc;` without an access modifier is the
    # default-public field form and still types `this.svc` receivers
    r"^\s*(?:(?:public|private|protected|static|readonly)\s+)*"
    r"([A-Za-z_$][\w$]*)\??\s*:\s*([A-Z][\w$]*)"
)
_TS_IMPORT = re.compile(
    # leading `type` is the type-only-import keyword, not a default binding
    r"^\s*import\s+(?:type\s+(?=[{\w]))?"
    r"(?:([\w$]+)\s*,?\s*)?(?:\{([^}]*)\}\s*)?from\s+['\"]([^'\"]+)['\"]"
)
# `import * as ns from "mod"` — namespace import; name '*' + alias ns,
# the same wildcard convention the Java `.{asterisk}` imports use
_TS_NS_IMPORT = re.compile(
    r"^\s*import\s+(?:type\s+)?\*\s+as\s+([\w$]+)\s+from\s+['\"]([^'\"]+)['\"]"
)
# `export { a as b } from "mod"` / `export * from "mod"` — re-exports ARE
# imports for chain resolution (J8 re-export chains walk through them)
_TS_REEXPORT = re.compile(
    r"^\s*export\s+(?:type\s+)?(?:\{([^}]*)\}|(\*))\s*from\s+['\"]([^'\"]+)['\"]"
)
# named-import brace still open at EOL (`import {` / `import Def, {`):
# continuation lines are joined until the `from '...'` clause appears, then
# the single-line regex re-runs on the joined text
_TS_IMPORT_OPEN = re.compile(r"^\s*import\s+(?:[\w$]+\s*,\s*)?\{[^}]*$")
_TS_IMPORT_FROM = re.compile(r"from\s*['\"]")
# const/let/var binding of an arrow function — the dominant definition form
# in modern TS; the reference's tree-sitter grammar extracts these as
# functions alongside `function` declarations
_TS_ARROW = re.compile(
    # return-type annotation: [^=]*? is non-greedy and cannot cross the `=`
    # of the arrow, but DOES admit `>` so generic returns
    # (`: Promise<string> =>`) fold like plain ones
    r"^(\s*)(?:export\s+)?(?:default\s+)?(?:const|let|var)\s+([A-Za-z_$][\w$]*)"
    r"\s*(?::[^=]+)?=\s*(?:async\s+)?(?:\([^)]*\)|[A-Za-z_$][\w$]*)\s*(?::[^=]*?)?\s*=>"
)
# const/let/var binding of a class or (generator) function EXPRESSION — the
# reference folds NamedClassExpression → Class and NamedFunctionExpression /
# NamedGeneratorFunctionExpression / NamedArrowFunction → Function
# (typescript.rs:286-303), keyed by the declarator name. NamedCallExpression
# (`const x = factory(...)`) is NOT extracted here: the fixture's method
# bodies are full of such bindings and the reference's own 84-definition
# count over fixtures/typescript/test-repo excludes them (tests.rs:369-454).
_TS_NAMED_EXPR = re.compile(
    r"^(\s*)(?:export\s+)?(?:default\s+)?(?:const|let|var)\s+([A-Za-z_$][\w$]*)"
    r"\s*(?::[^=]+)?=\s*(?:(class)\b|(?:async\s+)?function\b\s*\*?)"
)
# class FIELD initialized with an arrow (`private go = () => {...}`):
# a named arrow binding like the const form above (NamedArrowFunction →
# Function, typescript.rs:294), scoped to the class. Gated at the call site
# on the enclosing frame being a class so method-body assignments
# (`x = y => ...`) never match.
_TS_FIELD_ARROW = re.compile(
    r"^(\s*)(?:public\s+|private\s+|protected\s+|readonly\s+|static\s+"
    r"|override\s+|accessor\s+)*"
    r"(?!(?:const|let|var|return|if|while|for|switch|case|typeof|await"
    r"|yield|new|else|do|export|import|delete|void|in|of)\b)"
    r"([A-Za-z_$][\w$]*)\s*[?!]?\s*(?::[^=]+)?=\s*(?:async\s+)?"
    r"(?:\([^)]*\)|[A-Za-z_$][\w$]*)\s*(?::[^=]*?)?\s*=>"
)
# Brace-language analyzers (Java/Kotlin/C#/Rust): type + member declarations.
# Same contract as the tree-sitter analyzers they stand in for
# (parsing/processor.rs:195-204 lists the 7 supported languages).
_JAVA_TYPE = re.compile(
    # `@interface` = annotation type declaration — the reference simplifies
    # JavaDefinitionType::AnnotationDeclaration to CLASS, not Interface
    # (java/analyzer.rs:276); the captured `@` routes it accordingly
    r"^(\s*)(?:public\s+|private\s+|protected\s+|static\s+|final\s+|abstract\s+|sealed\s+)*"
    r"(@?)(class|interface|enum|record)\s+([A-Za-z_$][\w$]*)"
)
_JAVA_METHOD = re.compile(
    r"^(\s*)(?:public\s+|private\s+|protected\s+|static\s+|final\s+|abstract\s+"
    r"|synchronized\s+|default\s+)+"
    r"[\w<>\[\],.\s]+\s+([a-z][\w$]*)\s*\("
)
# package-private method: NO access modifier (`void run(String... args)`,
# `int bits()`) — tree-sitter's method_declaration doesn't require
# modifiers. Shape-guarded instead: a single return-type token (optional
# generics/array suffix) then the name directly before '(' — and the first
# word must not be a statement keyword (`return compute(...)` is the false
# positive the modifier anchor used to exclude).
_JAVA_METHOD_BARE = re.compile(
    r"^(\s*)(?!(?:return|throw|new|else|do|while|for|if|switch|case|break"
    r"|continue|assert|yield|super|this|try|catch|finally)\b)"
    r"[A-Za-z_$][\w$]*(?:<[^;={}]*>)?(?:\[\])*\s+([a-z][\w$]*)\s*\("
)
# `extends X` / `implements A, B` clauses on a Java type declaration line —
# both feed the inheritance chain the reference climbs for member lookup
# (java/tests.rs:339-359: super.apply() in ServerFilter.Filter resolves
# through `extends ServerFilter` into `implements Filter`'s default method).
# Searched on a generics-stripped copy so `<T extends Bound>` never matches.
_JAVA_EXTENDS = re.compile(r"\bextends\s+([A-Z][\w.]*)")
_JAVA_IMPLEMENTS = re.compile(r"\bimplements\s+([A-Z][\w.,\s]*)")
_JAVA_IMPORT = re.compile(r"^\s*import\s+(?:static\s+)?([\w.]+?)(?:\.\*)?\s*;")
# constructor (Java + C#): access modifier(s), then the PascalCase type name
# directly followed by '(' — no return type, so the method regexes miss it
_CTOR = re.compile(
    r"^(\s*)(?:public\s+|private\s+|protected\s+|internal\s+)+([A-Z][\w]*)\s*\("
)
# Java field: modifiers + type + lowercase name ending in '=' or ';'
# C# auto-property: modifiers + type + PascalCase name + '{ get' / '{ set'
_CS_PROP = re.compile(
    r"^(\s*)(?:public\s+|private\s+|protected\s+|internal\s+|static\s+|virtual\s+|override\s+)+"
    r"[\w<>\[\],\s?]+\s+([A-Z][\w]*)\s*\{\s*(?:get|set)"
)
# kind-inventory audit (r8, CSharpDefinitionType arms csharp.rs:245-297):
# Indexer → Property (indexed under the declared token `this`), Finalizer →
# InstanceMethod (name `~Type`, keeping the FQN distinct from the ctor's),
# Operator → StaticMethod (name `operator<sym>`); Event and Field simplify
# to None there and stay unextracted here. parser-core's exact name strings
# for these members aren't pinned by any reference fixture — the source
# tokens are used, documented in COVERAGE.md.
_CS_INDEXER = re.compile(
    r"^(\s*)(?:public\s+|private\s+|protected\s+|internal\s+|static\s+|virtual\s+"
    r"|override\s+|abstract\s+|sealed\s+|extern\s+|unsafe\s+|readonly\s+)+"
    r"[\w<>\[\],.\s?]+\s+(this)\s*\["
)
_CS_FINALIZER = re.compile(r"^(\s*)~([A-Z][\w]*)\s*\(\s*\)")
_CS_OPERATOR = re.compile(
    r"^(\s*)(?:public\s+|private\s+|protected\s+|internal\s+|static\s+|extern\s+"
    r"|unsafe\s+)+[\w<>\[\],.\s?]*\boperator\s*"
    r"([+\-*/%!~&|^<>=]{1,3}|true|false|checked\s+[+\-*/]{1,2})\s*\("
)
# conversion operators (`public static implicit operator Celsius(double d)`)
# — the declared name is the TARGET TYPE after `operator`
_CS_CONV_OPERATOR = re.compile(
    r"^(\s*)(?:public\s+|private\s+|protected\s+|internal\s+|static\s+)+"
    r"(?:implicit|explicit)\s+operator\s+([A-Za-z_][\w.<>\[\]]*)\s*\("
)
_KT_DEF = re.compile(
    r"^(\s*)(?:data\s+|open\s+|sealed\s+|abstract\s+|final\s+|private\s+|public\s+"
    r"|protected\s+|internal\s+|suspend\s+|override\s+|operator\s+|inner\s+"
    # `value class` is KotlinDefinitionType::ValueClass — indexed like any
    # class (kotlin_file.rs:119-124 ValueClass → index_class)
    r"|inline\s+|tailrec\s+|external\s+|enum\s+|annotation\s+|value\s+)*"
    r"(class|interface|object|fun)\s+(?:<[^>]*>\s+)?"
    # extension receiver (`fun String.capitalizeWords()`, possibly dotted /
    # generic) is NOT part of the reference FQN — kotlin/tests.rs:495 expects
    # `com.example.extensions.printValue` for `fun ExtendMe.printValue()`
    r"(?:[A-Z][\w.]*(?:<[^>]*>)?\.)?([A-Za-z_][\w]*)"
)
_KT_IMPORT = re.compile(r"^\s*import\s+([\w.]+)(?:\s+as\s+(\w+))?")
# Kotlin extras (kotlin/tests.rs parity): package declaration (no ';'),
# companion objects (a scope frame named Companion, reachable from the
# class through the lookup chain), supertype clause after ':', and
# val/var local type inference (annotation, constructor RHS, enum-constant
# RHS) feeding receiver-typed call resolution
_KT_PKG = re.compile(r"^\s*package\s+([\w.]+)")
_KT_COMPANION = re.compile(r"^(\s*)companion\s+object\b")
_KT_SUPER = re.compile(r":\s*([A-Z][\w.]*)")
_KT_LOCAL = re.compile(
    r"^\s*(?:val|var)\s+([A-Za-z_]\w*)\s*"
    r"(?::\s*([A-Za-z_][\w.]*)(?:<[^>]*>)?\s*\??)?"
    r"(?:\s*=\s*(.*))?$"
)
_KT_CTOR_RHS = re.compile(r"^([A-Z][\w.]*)(?:<[^>]*>)?\s*\(")
_KT_ENUM_RHS = re.compile(r"^([A-Z][\w.]*)\.([A-Z][A-Z0-9_]*)\s*$")
# `val x = when/if/try ...` — branch-expression RHS; the local's type is the
# first constructor the branches produce, and call resolution climbs the
# inheritance chain from there (kotlin/tests.rs:232-308: `when { "admin" ->
# Admin(); else -> User() }` + person.getName() resolves Person.getName)
_KT_EXPR_RHS = re.compile(r"^(?:when|if|try)\b")
_KT_EXPR_CTOR = re.compile(r"(?<![\w.])([A-Z]\w*)(?:<[^>]*>)?\s*\(")
# expression-bodied function: `fun f(...) = <expr>` / `fun f(...): T = <expr>`
_KT_FUN_EXPR = re.compile(r"\)\s*(?::\s*[\w.<>?]+\s*)?=\s*(.+)$")
# Kotlin receiver call, `?.` safe-call tolerated on every hop
_KT_RECV_CALL = re.compile(
    r"((?:[A-Za-z_$][\w$]*\??\.)*[A-Za-z_$][\w$]*)\??\.([A-Za-z_$][\w$]*)\s*\("
)
# `f(args).method()` — receiver is a local function call; its type comes
# from the expression-bodied return inference (kotlin/tests.rs:258-282)
_KT_FUNRET_RECV = re.compile(
    r"(?<![.\w])([a-z_]\w*)\s*\(([^()]*)\)\s*\??\.\s*([A-Za-z_]\w*)\s*\("
)
# extension function receiver: `fun ExtendMe.printValue()` — the receiver
# type is recorded on the definition row so receiver-typed calls resolve
# into it; the FQN stays receiver-free (kotlin/tests.rs:482-516 asserts
# com.example.extensions.printValue / com.example.extensions.utils.reverse)
_KT_EXT_FUN = re.compile(
    r"\bfun\s+(?:<[^>]*>\s+)?([A-Z][\w.]*)(?:<[^>]*>)?\.[A-Za-z_]\w*\s*\("
)
# extension property head (`val ExtendMe.extend` / `val ExtendMe.x: T`) with
# the getter on the same or following line; the property's result type lets
# the build hop `x.prop.method()` through it (kotlin/tests.rs:517-538)
_KT_EXT_PROP = re.compile(
    r"^\s*(?:private\s+|internal\s+|public\s+)*(?:val|var)\s+"
    r"([A-Z][\w.]*)(?:<[^>]*>)?\.([A-Za-z_]\w*)\s*"
    r"(?::\s*([A-Za-z_][\w.]*)(?:<[^>]*>)?\s*\??)?\s*$"
)
_KT_GETTER = re.compile(r"^\s*get\(\)\s*=\s*(.+)$")
# class-body / top-level `val`/`var` — KotlinDefinitionType::Property (a
# first-class indexed kind, kotlin/analyzer.rs:221-245,300: Class→Property
# is CLASS_TO_PROPERTY, Interface→Property INTERFACE_TO_PROPERTY); function
# bodies are LocalVariable there, which simplifies to None — excluded here
# by the innermost-frame gate at the call site. Lowercase-initial name
# keeps the extension-property receiver form (`val User.twin`) out — that
# one gets its definition row in the ext-prop branch.
_KT_PROP = re.compile(
    r"^(\s*)(?:private\s+|protected\s+|public\s+|internal\s+|open\s+"
    r"|override\s+|final\s+|const\s+|lateinit\s+)*"
    r"(?:val|var)\s+([a-z_][\w]*)\s*(?::|=|$)"
)
# secondary constructor declaration (`constructor(x: Int) : this(x, 0) {`)
# — KotlinDefinitionType::Constructor; Class→Constructor maps to
# CLASS_TO_CONSTRUCTOR (kotlin/analyzer.rs:227-228). The FQN convention is
# `{ClassFqn}.<init>` — the reference's expression resolver looks
# constructors up at exactly that key (expression_resolver.rs:742,1460)
_KT_SECONDARY_CTOR = re.compile(
    r"^(\s*)(?:private\s+|protected\s+|public\s+|internal\s+)*constructor\s*\("
)
_KT_CTOR_PROP = re.compile(r"(?<![\w.])(?:val|var)\s+([a-z_]\w*)")


def _kt_primary_ctor_props(masked, ln: int, start_col: int):
    """(name, line, col) for `val`/`var` PRIMARY-constructor parameters:
    accepted only at depth 1 of the class header's parameter list (nested
    default-arg calls / function types are blanked before the name regex
    runs), scanning ≤16 physical lines from the class line. Plain
    parameters are KotlinDefinitionType::Parameter in the reference and
    simplify to None (unindexed); val/var parameters declare class
    Properties (kotlin/analyzer.rs:221-224 Class→Property).

    Returns (props, last_line) — last_line is the final physical line the
    parameter list occupied, so the caller can keep the body-property
    branch off the header's continuation lines."""
    out = []
    last = ln
    for li, vis in _header_param_lines(masked, ln, start_col):
        for m in _KT_CTOR_PROP.finditer(vis):
            out.append((m.group(1), li, m.start(1)))
        last = li
    return out, last


def _header_param_lines(masked, ln: int, start_col: int, nested_fill: str = " "):
    """Yield (line_no, depth1_text) for the parameter list opened by the
    first ``(`` at/after ``start_col`` on line ``ln`` — nested parens are
    blanked, positions stay column-faithful; stops at the matching ``)``
    (or after 16 physical lines). Nothing yields when a ``{`` body opens
    before any parameter list.

    ``nested_fill`` is the replacement char for nested-paren regions:
    ``" "`` erases them (Kotlin — ctor-prop regex must not see them);
    a non-space placeholder keeps them as an opaque TOKEN so a chunk like
    ``(int A, string B) Pair`` still splits into (type, name) downstream
    (C# positional records with tuple types)."""
    depth = 0
    opened = False
    for li in range(ln, min(ln + 17, len(masked))):
        cur = masked[li][0]
        buf = []
        done = False
        for k, ch in enumerate(cur):
            if li == ln and k < start_col:
                buf.append(" ")
                continue
            if not opened:
                if ch == "(":
                    opened = True
                    depth = 1
                elif ch in "{;":
                    return  # body/declaration end first — no ctor list
                buf.append(" ")
                continue
            if ch == "(":
                depth += 1
                buf.append(nested_fill if depth >= 2 else " ")
            elif ch == ")":
                depth -= 1
                buf.append(nested_fill if depth >= 1 else " ")
                if depth == 0:
                    done = True
                    break
            else:
                buf.append(ch if depth == 1 else nested_fill)
        if not opened:
            # the primary-ctor `(` always sits on the header line itself
            # (Kotlin and C# grammars) — never scan ahead for one
            return
        yield li, "".join(buf)
        if done:
            return


# C# positional record parameters — each IS a public init-only property of
# the record (language semantics; the reference's Record type itself
# simplifies to Class, csharp.rs:252, and Property is first-class there).
# The name is the last identifier of the chunk left of any default (`=`).
_CS_RECORD_PARAM = re.compile(r"([A-Za-z_]\w*)\s*$")


def _cs_record_props(masked, ln: int, start_col: int):
    """(name, line, col) for the positional parameters of a C# record
    header — `record Person(string Name, int Age = 0)` declares Name/Age
    properties. Tuple types (`record R((int A, string B) Pair)`) survive
    as an opaque placeholder token via ``nested_fill``, and generic-type
    commas (`Dictionary<int, string> Map`) are blanked to the same
    placeholder before splitting so they can't split a parameter chunk."""
    out = []
    for li, vis in _header_param_lines(masked, ln, start_col, nested_fill="\x01"):
        # blank <...> contents (column-faithful) so generic commas don't
        # split chunks and generic `=` can't truncate them
        buf, ad = [], 0
        for ch in vis:
            if ch == "<":
                ad += 1
                buf.append("\x01")
            elif ch == ">" and ad > 0:
                ad -= 1
                buf.append("\x01")
            else:
                buf.append("\x01" if ad > 0 else ch)
        vis = "".join(buf)
        for chunk_m in re.finditer(r"[^,]+", vis):
            chunk = chunk_m.group(0).split("=", 1)[0].rstrip()
            m = _CS_RECORD_PARAM.search(chunk)
            # a one-token chunk is a bare type or continuation debris, not
            # a (type, name) parameter pair
            if m and len(chunk.split()) >= 2:
                out.append((m.group(1), li, chunk_m.start() + m.start(1)))
    return out

# ---------------------------------------------------------------------------
# Lambda / proc definitions (relationship.rs:36-66 LAMBDA_TO_*/CLASS_TO_PROC;
# python/analyzer.rs:1061,1084-1112; ruby/analyzer.rs:214-218;
# kotlin/analyzer.rs:224-280; java/analyzer.rs:222-252; csharp.rs:206-239)
# ---------------------------------------------------------------------------
# Each anonymous function expression becomes a definition row with
# definition_type Lambda (or Proc for Ruby's proc/Proc.new), named by its
# position (`lambda_{line}_{col}`, 0-based) so FQNs stay unique without
# per-scope counters. The parent chain is the enclosing definition's scope
# frame, so build.py's hierarchy pass types CLASS_TO_LAMBDA /
# METHOD_TO_LAMBDA / FUNCTION_TO_LAMBDA edges from the same generic
# parent-child join that types every other pair. TypeScript anonymous
# arrows are deliberately NOT lambdas — the reference's TS inventory has no
# Lambda type (typescript.rs; tests.rs:415-419 count 84 definitions over a
# fixture full of anonymous callbacks). Rust closures likewise.
_PY_LAMBDA = re.compile(r"(?<![\w.])lambda\b")
_RB_LAMBDA = re.compile(r"(?<![\w.<>-])(?:lambda\s*(?:\{|\bdo\b)|->)")
_RB_PROC = re.compile(r"(?<![\w.])(?:proc\s*(?:\{|\bdo\b)|Proc\s*\.\s*new)")
_JV_LAMBDA = re.compile(r"(?:\(([^()]*)\)|(?<![\w.$])[a-z_]\w*)\s*->")
# Kotlin lambda literal: `{ params -> ...` or the implicit-`it` form; a
# function TYPE's arrow (`(Int) -> Unit`) has no brace directly before the
# params, and when-branch arrows (`"admin" -> Admin()`) are guarded by the
# same-line `when` check at the call site
_KT_LAMBDA = re.compile(r"\{\s*(?:\([^)]*\)|[\w, .:<>?]+?)\s*->|\{(?=\s*it\b)")
# C# lambda: the param (or param list) must follow an argument/assignment
# delimiter — expression-bodied members (`int F() => x`), accessors
# (`get => _x`), and switch-expression arms (`_ => b` at line start) all
# lack one and are not lambdas
_CS_LAMBDA = re.compile(
    r"(?:[=,(:]\s*|\breturn\s+)(?:\(([^()]*)\)|(?P<csid>[_a-z]\w*))\s*=>"
)
_JV_SWITCH_ARM = re.compile(r"^\s*(?:case[\s(]|default\s*(?:->|:))")
# A Java 14 switch ARM arrow is the first `->` after a `case <label>` /
# `default` head; matching the arrow position lets genuine lambdas on the
# same line (`case A -> run(() -> f());`) still extract
_JV_ARM_ARROW = re.compile(r"(?:\bcase\b[^;{}]*?|\bdefault\s*)->")

# Multi-line signature head (Java/C#): a modifier-led declaration line whose
# return type wraps BEFORE the member name — no parens/brace/semicolon yet
# (`public static Map<String, Integer>` ⏎ `countItems(...) {`). The
# continuation lines are joined and the normal def regexes re-run on the
# joined text; start_line stays the head line, the tree-sitter behavior
# (the reference parses whole signature nodes — parsing/processor.rs).
# Signatures that wrap AFTER `name(` already match the per-line regexes.
_BRACE_METHOD_HEAD = re.compile(
    r"^(\s*)(?:(?:public|private|protected|static|final|abstract|synchronized"
    r"|default|virtual|override|internal|sealed|async|extern)\s+)+"
    r"[\w$][\w$<>\[\],\s?.]*$"
)


def _lambda_hits(language: str, line: str) -> list[tuple[int, str]]:
    """(col, definition_type) for each anonymous-function expression on the
    masked code line; empty for languages without a Lambda definition type."""
    if language == "Python":
        return [(m.start(), "Lambda") for m in _PY_LAMBDA.finditer(line)]
    if language == "Ruby":
        hits = [(m.start(), "Lambda") for m in _RB_LAMBDA.finditer(line)]
        hits += [(m.start(), "Proc") for m in _RB_PROC.finditer(line)]
        return sorted(hits)
    if language == "Java":
        # Java 14 switch arrows are not lambdas — but only the ARM arrows
        # themselves are suppressed (by position), so a genuine lambda on a
        # mixed line (`case A -> run(() -> f());`) still extracts
        arm_ends = {a.end() for a in _JV_ARM_ARROW.finditer(line)}
        return [
            (m.start(), "Lambda")
            for m in _JV_LAMBDA.finditer(line)
            if m.end() not in arm_ends
        ]
    if language == "Kotlin":
        out = []
        for m in _KT_LAMBDA.finditer(line):
            if "when" in line[: m.start()] and re.search(
                r"\bwhen\b", line[: m.start()]
            ):
                continue  # when-subject brace: arms are branches, not lambdas
            out.append((m.start(), "Lambda"))
        return out
    if language == "CSharp":
        # switch-expression arm lists: everything between `switch {` and its
        # matching `}` (to end-of-line if unclosed). Arms in there are
        # branches, not lambdas; arrows OUTSIDE the arm list on the same
        # line (a real lambda argument or assignment) still extract.
        regions = []
        for sw in re.finditer(r"\bswitch\s*\{", line):
            depth, i = 1, sw.end()
            while i < len(line) and depth:
                if line[i] == "{":
                    depth += 1
                elif line[i] == "}":
                    depth -= 1
                i += 1
            regions.append((sw.end(), i))
        # an operator DECLARATION's parameter list is not a lambda: for
        # `operator ==(C a, C b) => ...` the operator's own trailing `=`
        # satisfies the delimiter guard, so mask its param list out
        op = _CS_OPERATOR.match(line) or _CS_CONV_OPERATOR.match(line)
        if op:
            close = line.find(")", op.end())
            regions.append((op.start(2), close + 1 if close >= 0 else len(line)))
        out = []
        for m in _CS_LAMBDA.finditer(line):
            if m.group("csid") in ("get", "set", "value"):
                continue
            if any(lo <= m.start() < hi for lo, hi in regions):
                continue
            out.append((m.start(1) if m.group(1) is not None else m.start("csid"), "Lambda"))
        return out
    return []


def _py_nested_same_line(line: str, c1: int, c2: int) -> bool:
    """Is the lambda at c2 nested inside the lambda at c1 (same line)?
    Nested unless a comma at-or-below the first lambda's paren depth appears
    after its body colon (`f(lambda a: a, lambda b: b)` → siblings;
    `lambda x: lambda y: x` → nested) — the regex stand-in for tree-sitter's
    expression nesting."""
    depth = 0
    seen_colon = False
    for ch in line[c1:c2]:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False  # first lambda's enclosing call closed
        elif ch == ":" and depth == 0:
            seen_colon = True
        elif ch == "," and depth <= 0 and seen_colon:
            return False
    return seen_colon


def _kt_expr_ctor(rhs: str, masked: list, ln: int) -> str | None:
    """Constructor types a when/if/try expression produces, scanning
    continuation lines while the brace block stays open; `throw X(...)`
    constructors are not values and never type the expression. Multiple
    distinct branch types come back pipe-joined — the build stage resolves
    the set to its least common supertype through the inherits closure,
    the reference's branch-expression inference (kotlin/tests.rs:232-308:
    `when {.. -> Admin(); else -> User()}` + .getName() →
    Person.getName, the common supertype's method)."""
    texts = [rhs]
    depth = rhs.count("{") - rhs.count("}")
    if depth > 0:
        for nxt, _ in masked[ln + 1 : ln + 40]:
            texts.append(nxt)
            depth += nxt.count("{") - nxt.count("}")
            if depth <= 0:
                break
    seen: list[str] = []
    for t in texts:
        for m in _KT_EXPR_CTOR.finditer(t):
            if re.search(r"\bthrow\s+$", t[: m.start(1)]):
                continue
            if m.group(1) not in seen:
                seen.append(m.group(1))
    return "|".join(seen) if seen else None
# Python receiver-typed calls (python/analyzer.rs:148-387): self.method()
# → enclosing class, locals typed by constructor assignment
# (`x = ClassName(...)`), self-attribute types from `self.x = ClassName()`,
# inheritance chain from `class A(B):`
_PY_INHERIT = re.compile(r"^\s*class\s+[A-Za-z_]\w*\s*\(\s*([A-Za-z_][\w.]*)")
# Rust macro_rules! opener — its body is a token tree, suppressed wholesale
_RS_MACRO_RULES = re.compile(r"^(\s*)(?:pub\s+)?macro_rules!\s*[A-Za-z_]\w*\s*[{(\[]")
_PY_LOCAL_ASSIGN = re.compile(r"^\s*([a-z_]\w*)\s*=\s*([A-Z]\w*)\s*\(")
_PY_SELF_ASSIGN = re.compile(r"^\s*self\.(\w+)\s*=\s*([A-Z]\w*)\s*\(")
_PY_RECV_CALL = re.compile(r"((?:[A-Za-z_]\w*\.)*[A-Za-z_]\w*)\.([a-z_]\w*)\s*\(")
_CS_TYPE = re.compile(
    # `record struct X` / `record class X` are record declarations of the
    # compound kind — without the optional group, `struct` read as the name
    r"^(\s*)(?:public\s+|private\s+|protected\s+|internal\s+|static\s+|sealed\s+|abstract\s+|partial\s+|readonly\s+)*"
    r"(class|interface|struct|enum|record(?:\s+(?:struct|class))?)\s+([A-Za-z_][\w]*)"
)
_CS_METHOD = re.compile(
    r"^(\s*)(?:public\s+|private\s+|protected\s+|internal\s+|static\s+|virtual\s+|"
    r"override\s+|async\s+|sealed\s+|extern\s+)+[\w<>\[\],.\s?]+\s+([A-Za-z_][\w]*)\s*\("
)
# modifier-less member (implicitly private: `int Bits() => 1;`) — same
# shape guard as _JAVA_METHOD_BARE: one return-type token + name before
# '(', first word not a statement keyword
_CS_METHOD_BARE = re.compile(
    r"^(\s*)(?!(?:return|throw|new|else|do|while|for|foreach|if|switch|case"
    r"|break|continue|yield|await|using|lock|var|base|this|try|catch|finally)\b)"
    r"[A-Za-z_][\w]*(?:<[^;={}]*>)?(?:\[\])*\??\s+([A-Za-z_][\w]*)\s*\("
)
_CS_DELEGATE = re.compile(
    # `public delegate void Handler(int x);` — CSharpDefinitionType::Delegate,
    # which the reference SIMPLIFIES to Class before indexing (csharp.rs:280);
    # Event and Field simplify to None there and are deliberately not
    # extracted here either
    r"^(\s*)(?:public\s+|private\s+|protected\s+|internal\s+)*delegate\s+"
    r"[\w<>\[\],.\s?]+\s+([A-Za-z_][\w]*)\s*\("
)
_CS_IMPORT = re.compile(r"^\s*(?:global\s+)?using\s+(?:static\s+)?([\w.]+)\s*;")
# `using Alias = Some.Deep.Type;` — namespace/type alias directive: the
# imported name is the aliased target's last segment, Alias is the alias
_CS_USING_ALIAS = re.compile(r"^\s*(?:global\s+)?using\s+(\w+)\s*=\s*([\w.]+)\s*;")
# C# receiver calls: methods are PascalCase (`user.Activate()`); receiver
# may be dotted; constructor matches (`new Foo.Bar(`) are skipped inside
# receiver_calls via the new-prefix guard
_CS_RECV_CALL = re.compile(
    r"((?:[A-Za-z_][\w]*\.)*[A-Za-z_][\w]*)\.([A-Z]\w*)\s*\("
)
# `var x = new User(...)` / `User x = new User(...)` → local/field type
_CS_LOCAL_NEW = re.compile(
    r"^\s*(?:var\s+|[A-Z]\w*(?:<[^>]*>)?\s+)([_a-z]\w*)\s*=\s*new\s+([A-Z][\w.]*)"
)
# `class Foo : Bar` base-type clause (first supertype)
_CS_BASE = re.compile(r":\s*([A-Z][\w.]*)")
# property HEAD with the accessor block on a continuation line (Allman
# braces — the dominant C# style): modifiers + type + PascalCase name at
# EOL; confirmed iff the next lines open `{ get/set/init` before anything
# else, so multi-line method heads / stray type names never match
_CS_PROP_HEAD = re.compile(
    r"^(\s*)(?:public\s+|private\s+|protected\s+|internal\s+|static\s+|virtual\s+|override\s+|abstract\s+)+"
    r"[\w<>\[\],\s?]+\s+([A-Z][\w]*)\s*$"
)
_CS_PROP_CONT = re.compile(r"^\{\s*(?:\[[^\]]*\]\s*)?(?:get|set|init)\b")
# `namespace App.Services;` (file-scoped) or `namespace App.Services {` —
# the namespace is the leading FQN part (csharp.rs:301 treats
# namespace+type as top-level; CSharpFqnPartType::Namespace)
_CS_NS = re.compile(r"^\s*namespace\s+([\w.]+)")
_RS_DEF = re.compile(
    r"^(\s*)(?:pub(?:\([\w:]+\))?\s+)?(?:async\s+)?(?:unsafe\s+)?(fn|struct|enum|trait|mod|union)\s+([A-Za-z_][\w]*)"
)
# enum member inside an enum body: `Fast,` / `Packet(u32),` / `Flag = 1,` /
# Java `RED, GREEN;` (several per line) / Kotlin `NORTH(0),` — gated on the
# innermost frame being an enum so match arms / method bodies never match
_ENUM_ENTRY_NAME = re.compile(r"[A-Z]\w*")


def _enum_entries(segment: str):
    """Yield (name, col) for enum members in declaration position only:
    bracket-depth 0 of *segment*, anchored at the segment start or right
    after a depth-0 comma (annotations/attributes are transparent).

    A flat regex scan emitted spurious definitions from entry PAYLOADS —
    Rust `Payload(HashMap<String, Value>),` yielded a bogus `String`
    Variant, `Pair(A, B),` bogus `A`, Java `RED(new Hue(255)),` a bogus
    `Hue` constant — because a one-char lookbehind can't see nesting. The
    reference's tree-sitter grammars surface only enum_variant /
    enum_constant nodes (rust.rs:295, java/analyzer.rs:216), so this
    tracks paren depth across the segment instead.
    """
    depth = 0
    anchor = True
    i, n = 0, len(segment)
    while i < n:
        ch = segment[i]
        if ch in "([{":
            depth += 1
        elif ch in ")]":
            depth = max(0, depth - 1)
            if ch == "]" and depth == 0:
                # a closed `#[attr]` keeps declaration position
                anchor = True
        elif ch == "}":
            depth = max(0, depth - 1)
        elif depth == 0:
            if ch == ",":
                anchor = True
            elif ch == ";":
                # Java/Kotlin: `;` closes the constants section — nothing
                # after it on this line is an entry (Rust bodies have no
                # depth-0 `;`)
                return
            elif ch == "@":
                m = re.match(r"@[\w.]*", segment[i:])
                i += m.end()
                continue
            elif anchor and "A" <= ch <= "Z":
                m = _ENUM_ENTRY_NAME.match(segment, i)
                name = m.group(0)
                j = m.end()
                while j < n and segment[j] in " \t":
                    j += 1
                nxt = segment[j] if j < n else ""
                if nxt in ",;({=}" or nxt == "":
                    yield name, i
                anchor = False
                i = m.end()
                continue
            elif ch not in " \t":
                anchor = False
        i += 1
_ENUM_ENTRY_KIND = {
    # the reference's per-language member kind names (RustDefinitionType::
    # Variant, JavaDefinitionType::EnumConstant, KotlinDefinitionType::
    # EnumEntry); Java/Rust edge names are overridden in build.py to the
    # reference's reused edge types, Kotlin's snakes naturally to
    # CLASS_TO_ENUM_ENTRY
    "Rust": "Variant",
    "Java": "EnumConstant",
    "Kotlin": "EnumEntry",
}
# `impl Type` / `impl Trait for Type` opens a method scope: tracked as an
# enclosing-name frame (methods inside get parent = the impl target) without
# emitting a definition row — the reference's tree-sitter analyzers likewise
# attribute methods to the type, not to the impl block itself.
_RS_IMPL = re.compile(
    r"^(\s*)impl(?:<[^>]*>)?\s+(?:[\w:<>]+\s+for\s+)?([A-Za-z_][\w]*)(?:<[^>]*>)?\s*(?:\{|$)"
)
_RS_IMPORT = re.compile(r"^\s*(?:pub\s+)?use\s+([\w:]+)(?:\s+as\s+(\w+))?")
# struct/union field in a type body: `pub host: String,` — the reference
# indexes Rust Fields with Struct→Field / Union→Field reusing ClassToMethod
# (rust.rs:287-292,317-322); gated on the innermost frame being a
# struct/union so fn params, match arms and where-clauses never match
_RS_FIELD = re.compile(r"^\s*(?:pub(?:\([\w:]+\))?\s+)?([a-z_]\w*)\s*:\s*\S")
# Rust: `let x = Type::new()` / `let x: Type = ...` types the local;
# `Type::assoc_fn()` associated calls resolve into the impl'd type
_RS_LET = re.compile(
    r"^\s*let\s+(?:mut\s+)?([a-z_]\w*)\s*"
    r"(?::\s*&?(?:mut\s+)?([A-Z]\w*)(?:<[^>]*>)?)?"
    r"\s*=\s*(?:([A-Z]\w*)\s*::)?"
)
_RS_ASSOC_CALL = re.compile(r"([A-Z]\w*)\s*::\s*([a-z_]\w*!?)\s*\(")
# bare-name call: NOT preceded by '.' or ':' — a dotted (or Rust `::`-path)
# call is a receiver call and must resolve through the receiver's type,
# never by bare name
_CALL = re.compile(r"(?<![.\w:])([A-Za-z_][A-Za-z0-9_]*)\s*\(")
_KEYWORDS = {
    "if", "for", "while", "return", "def", "class", "function", "switch", "catch",
    "print", "super", "new", "import", "require", "elif", "unless", "until", "puts",
    "do", "try", "else", "typeof", "await",
}
# suppressed in bare-name CALL scans only (never in definition matching —
# `constructor() {}` is a real TS method definition): `this(...)` /
# `constructor(...)` are ctor-delegation syntax, not calls to a symbol
_CALL_NOISE = {"this", "constructor"}


# ---------------------------------------------------------------------------
# Comment / string masking pre-pass
# ---------------------------------------------------------------------------
# The reference's tree-sitter parse never sees comments or string contents as
# code; a line-regex analyzer does unless told otherwise (a `# def foo`
# comment or a `"User.find("` literal would emit entities). Each line is
# masked into two same-length variants before any regex runs:
#   code_line   — comments AND string contents blanked (def/call/assign
#                 matching; columns and widths stay aligned with the source)
#   import_line — only comments blanked, string contents kept (import paths
#                 live inside literals: `require 'foo'`, `from 'mod'`)
_LANG_SYNTAX = {
    "Python": {"line_comment": "#", "strings": ('"""', "'''", '"', "'")},
    "Ruby": {"line_comment": "#", "strings": ('"', "'"), "block_line": ("=begin", "=end")},
    "TypeScript": {"line_comment": "//", "block": ("/*", "*/"), "strings": ('"', "'", "`")},
    # Java 15+ text blocks (`"""`) are multiline strings — without the
    # triple delimiter their bodies leak into the code view (r8 hostile
    # generator catch: class/method text inside a text block extracted)
    "Java": {"line_comment": "//", "block": ("/*", "*/"), "strings": ('"""', '"', "'")},
    "Kotlin": {"line_comment": "//", "block": ("/*", "*/"), "strings": ('"""', '"', "'")},
    "CSharp": {"line_comment": "//", "block": ("/*", "*/"), "strings": ('"', "'")},
    # Rust: `'` is a lifetime marker far more often than a char literal —
    # treating it as a string opener would mask real code, so only `"`.
    "Rust": {"line_comment": "//", "block": ("/*", "*/"), "strings": ('"',)},
}
_MULTILINE_STRINGS = ('"""', "'''", "`")

# string-interpolation openers whose inner EXPRESSION stays VISIBLE in the
# code view: tree-sitter parses interpolations as real expression nodes, so
# calls inside f"{fmt(x)}" / "${u.name()}" / `#{call()}` are call sites in
# the reference. The opener/closer braces themselves are masked (so
# brace-counting logic never sees them); inner text is copied verbatim.
# Python f-strings and C# $-strings are detected per-literal at open time.
_INTERP_OPENERS = {
    "Kotlin": {'"': "${", '"""': "${"},
    "TypeScript": {"`": "${"},
    "Ruby": {'"': "#{"},
}


# Ruby heredoc opener, matched in code position: `<<~EOS` / `<<-EOS` /
# `<<'EOS'` / `<<"EOS"` always open one; bare `<<IDENT` only when IDENT is
# ALL-CAPS (the dominant convention) so `x<<y` / `arr << item` shift/append
# expressions don't false-positive. The body runs until a line equal to the
# tag (stripped for ~/-, column-0 for bare/quoted), and is data, not code —
# tree-sitter never sees heredoc contents as statements (ruby/analyzer.rs
# operates on the parsed tree), so both mask views blank it.
_HEREDOC_OPEN = re.compile(
    r"<<(?:([~-])(['\"]?)([A-Za-z_]\w*)\2|(['\"])([A-Za-z_]\w*)\4|([A-Z][A-Z0-9_]*)\b)"
)


def _mask_text(language: str, text: str) -> list[tuple[str, str]]:
    """Per line: (code_line, import_line), both exactly as long as the
    original line (chars), so every column/width downstream stays valid."""
    lines = text.split("\n")
    cfg = _LANG_SYNTAX.get(language)
    if cfg is None:
        return [(l, l) for l in lines]
    strings = cfg.get("strings", ())
    lc = cfg.get("line_comment")
    blk = cfg.get("block")
    blk_line = cfg.get("block_line")
    heredocs = language == "Ruby"
    pending_heredocs: list[tuple[str, bool]] = []  # (tag, indent_ok), FIFO
    out: list[tuple[str, str]] = []
    state: object = None  # None | ("str", delim) | "block" | "block_line"
    for line in lines:
        n = len(line)
        if pending_heredocs and not isinstance(state, tuple):
            # inside a heredoc body: the whole line is data in BOTH views
            out.append((" " * n, " " * n))
            tag, indent_ok = pending_heredocs[0]
            terminated = line.strip() == tag if indent_ok else line == tag
            if terminated:
                pending_heredocs.pop(0)
            continue
        if blk_line is not None and not isinstance(state, tuple) and state != "block":
            if state == "block_line":
                out.append((" " * n, " " * n))
                if line.startswith(blk_line[1]):
                    state = None
                continue
            if line.startswith(blk_line[0]):
                out.append((" " * n, " " * n))
                state = "block_line"
                continue
        if language == "CSharp" and state is None and line.lstrip().startswith("#"):
            # preprocessor directive: tree-sitter-c-sharp parses the whole
            # line as a preproc node with no code children. `#region` titles
            # are FREE TEXT — `#region helpers compute(1, 2) {` minted a
            # phantom call and its unbalanced brace desynced scope depth
            # (pygments-differential catch, r8). #if/#else BODIES stay
            # visible (both branches are parsed, like the reference).
            out.append((" " * n, " " * n))
            continue
        code: list[str] = []
        imp: list[str] = []
        i = 0
        while i < n:
            if state is None:
                if lc and line.startswith(lc, i):
                    pad = " " * (n - i)
                    code.append(pad)
                    imp.append(pad)
                    i = n
                    continue
                if blk and line.startswith(blk[0], i):
                    pad = " " * len(blk[0])
                    code.append(pad)
                    imp.append(pad)
                    i += len(blk[0])
                    state = "block"
                    continue
                if heredocs and line.startswith("<<", i):
                    m = _HEREDOC_OPEN.match(line, i)
                    if m is not None:
                        tag = m.group(3) or m.group(5) or m.group(6)
                        indent_ok = m.group(1) is not None
                        pending_heredocs.append((tag, indent_ok))
                        frag = m.group(0)
                        code.append(frag)
                        imp.append(frag)
                        i += len(frag)
                        continue
                delim = next((d for d in strings if line.startswith(d, i)), None)
                if delim is not None:
                    opener = _INTERP_OPENERS.get(language, {}).get(delim)
                    if language == "Python":
                        # f-string: an f/F in the (≤3-char) prefix
                        j = i - 1
                        pref = ""
                        while j >= 0 and line[j].isalpha() and len(pref) < 3:
                            pref = line[j] + pref
                            j -= 1
                        opener = "{" if "f" in pref.lower() else None
                    elif language == "CSharp" and delim == '"':
                        if (i >= 1 and line[i - 1] == "$") or (
                            i >= 2 and line[i - 2 : i] in ("$@", "@$")
                        ):
                            opener = "{"
                    code.append(delim)
                    imp.append(delim)
                    i += len(delim)
                    state = ("str", delim, opener)
                    continue
                code.append(line[i])
                imp.append(line[i])
                i += 1
            elif state == "block":
                if line.startswith(blk[1], i):
                    pad = " " * len(blk[1])
                    code.append(pad)
                    imp.append(pad)
                    i += len(blk[1])
                    state = None
                else:
                    code.append(" ")
                    imp.append(" ")
                    i += 1
            elif state[0] == "str":  # inside a string literal
                delim, opener = state[1], state[2]
                if line[i] == "\\" and i + 1 < n:
                    code.append("  ")
                    imp.append(line[i : i + 2])
                    i += 2
                elif line.startswith(delim, i):
                    code.append(delim)
                    imp.append(delim)
                    i += len(delim)
                    state = None
                elif opener and line.startswith(opener, i):
                    if opener == "{" and line.startswith("{{", i):
                        # escaped literal brace (f-string / C# $-string)
                        code.append("  ")
                        imp.append(line[i : i + 2])
                        i += 2
                    else:
                        code.append(" " * len(opener))
                        imp.append(line[i : i + len(opener)])
                        i += len(opener)
                        state = ("interp", delim, opener, 1)
                else:
                    code.append(" ")
                    imp.append(line[i])
                    i += 1
            else:  # inside an interpolation: expression chars stay visible
                delim, opener, depth = state[1], state[2], state[3]
                nq = state[4] if len(state) > 4 else None
                ch = line[i]
                if nq is not None:
                    # inside a nested string literal WITHIN the interpolation
                    # (Ruby "#{h["}"]}", Kotlin "${f("}")}"): mask its
                    # contents so a '}' or quote in it can't close the
                    # interpolation early and desync the rest of the line
                    if ch == "\\" and i + 1 < n:
                        code.append("  ")
                        imp.append(line[i : i + 2])
                        i += 2
                        continue
                    if ch == nq:
                        code.append(ch)
                        imp.append(ch)
                        state = ("interp", delim, opener, depth)
                    else:
                        code.append(" ")
                        imp.append(ch)
                    i += 1
                    continue
                if ch in ('"', "'"):
                    code.append(ch)
                    imp.append(ch)
                    state = ("interp", delim, opener, depth, ch)
                    i += 1
                    continue
                if ch == "{":
                    state = ("interp", delim, opener, depth + 1)
                    code.append(ch)
                    imp.append(ch)
                elif ch == "}":
                    if depth == 1:
                        code.append(" ")  # the closer is masked like the opener
                        imp.append(ch)
                        state = ("str", delim, opener)
                    else:
                        state = ("interp", delim, opener, depth - 1)
                        code.append(ch)
                        imp.append(ch)
                else:
                    code.append(ch)
                    imp.append(ch)
                i += 1
        if isinstance(state, tuple) and state[1] not in _MULTILINE_STRINGS:
            state = None  # unterminated single-line literal: reset at EOL
        out.append(("".join(code), "".join(imp)))
    return out


_KIND_BY_KEYWORD = {
    "method": "Method",
    "property": "Property",
    "class": "Class",
    "record": "Class",
    "struct": "Class",
    "enum": "Class",
    "module": "Module",
    "object": "Module",
    "mod": "Module",
    "interface": "Interface",
    "trait": "Interface",
    # Rust union (RustDefinitionType::Union) joins the struct/enum collapse —
    # this extractor's cross-language vocabulary folds data types onto Class
    "union": "Class",
    "variant": "Variant",
    # C# delegate — the reference simplifies it to Class (csharp.rs:280)
    "delegate": "Class",
}


# parameter typing: `fun run(u: User)` / `void run(User u)` /
# `def m(self, user: User)` — the declared parameter type seeds the same
# local-type map constructor assignments feed, so param receivers resolve
# (the reference's analyzers type parameters through tree-sitter's
# formal_parameters; this is the regex stand-in)
_PARAM_COLON = re.compile(  # Kotlin / TypeScript / Python annotations
    r"([A-Za-z_$][\w$]*)\s*:\s*([A-Za-z_$][\w$.]*)"
)
_PARAM_TYPE_FIRST = re.compile(  # Java / C#: Type name (generics/arrays ok)
    r"([A-Z][\w$]*(?:<[^<>]*(?:<[^<>]*>)?[^<>]*>)?(?:\[\])*)(?:\.\.\.)?\s+"
    r"([a-z_$][\w$]*)"
)


def _param_types(language: str, line: str) -> list[tuple[str, str]]:
    """(param_name, base_type) pairs declared on a signature line."""
    if "(" not in line:
        return []
    params = line.split("(", 1)[1]
    depth, end = 1, len(params)
    for i, ch in enumerate(params):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    params = params[:end]
    out = []
    if language in ("Kotlin", "TypeScript", "Python"):
        for m in _PARAM_COLON.finditer(params):
            base = m.group(2).split(".")[-1]
            if base[:1].isupper():
                out.append((m.group(1), base))
    elif language in ("Java", "CSharp"):
        for m in _PARAM_TYPE_FIRST.finditer(params):
            out.append((m.group(2), m.group(1).split("<")[0].rstrip("[]")))
    return out


# chained navigation — `u.name().shout()`: the tail's receiver is the mid
# call's return type (groups: receiver, mid, tail; args non-capturing)
_CHAIN_TAIL = re.compile(
    r"((?:[A-Za-z_$@][\w$]*\.)*[A-Za-z_$@][\w$]*)"
    r"\.([A-Za-z_]\w*)\s*\((?:[^()]*)\)\.([a-z_]\w*)\s*\("
)
# C# methods are PascalCase (`p.Acquire().Close()`) — the lowercase-initial
# tail above can never match them, so C# gets its own tail pattern; other
# languages keep the lowercase tail to avoid ctor-ish false positives
_CHAIN_TAIL_CS = re.compile(
    r"((?:[A-Za-z_$@][\w$]*\.)*[A-Za-z_$@][\w$]*)"
    r"\.([A-Za-z_]\w*)\s*\((?:[^()]*)\)\.([A-Za-z_]\w*)\s*\("
)
_RB_CHAIN_TAIL = re.compile(
    r"(@?[A-Za-z_]\w*)\.([a-z_]\w*)\.([a-z_]\w*[?!]?)"
)
_RET_COLON = re.compile(r"\)\s*:\s*([A-Za-z_][\w.]*)")  # Kotlin/TS `): Type`
_RET_PY = re.compile(r"->\s*([A-Za-z_][\w.\[\]]*)\s*:")  # Python `-> Type:`
_RB_FACTORY_BODY = re.compile(r"^\s*([A-Z]\w*)\.new\b")


def _scan_method_returns(language: str, masked: list) -> dict[tuple[str, str], str]:
    """(enclosing_type, method) → declared return base type, whole-file
    pre-scan (like the ivar pre-scan: chains may reference methods defined
    LATER in the file; the reference's type maps are file-order-free).
    Ruby has no annotations — the `def profile; Profile.new; end` factory
    idiom is inferred from the body's leading constructor instead
    (ruby/type_map.rs types through the same ctor pattern)."""
    rets: dict[tuple[str, str], str] = {}
    stack: list[tuple[int, str, bool]] = []  # (indent, name, is_type)
    type_kws = {"class", "module", "interface", "enum", "record", "struct", "object", "impl"}
    alt = {"Python": _PY_DEF, "Ruby": _RB_DEF, "TypeScript": _TS_DEF}.get(language)
    for i, (line, _) in enumerate(masked):
        det = _match_def(language, line)
        if det is None and alt is not None:
            m = alt.match(line)
            if m:
                if language == "Ruby":
                    det = (len(m.group(1)), m.group(2), m.group(4))
                else:
                    det = (len(m.group(1)), m.group(2), m.group(3))
        if det is None and language == "TypeScript":
            m = _TS_METHOD.match(line)
            if m and m.group(3) not in _KEYWORDS:
                # host-frame guard (mirrors the main scan's innermost-class
                # check): `register(handler, (x): Config => {` inside a
                # function body matches _TS_METHOD but is a call statement,
                # not a method — only record when the innermost enclosing
                # frame is a type, so no bogus return-type entries seed the
                # chain-tail pass
                ind = len(m.group(1))
                host_is_type = next(
                    (t for _ind, _n, t in reversed(stack) if _ind < ind), False
                )
                if host_is_type:
                    det = (ind, "method", m.group(3))
        if det is None:
            continue
        indent, kw, name = det
        while stack and stack[-1][0] >= indent:
            stack.pop()
        if kw in type_kws:
            stack.append((indent, name, True))
            continue
        encl = next((n for _ind, n, t in reversed(stack) if t), None)
        stack.append((indent, name, False))
        if encl is None:
            continue
        rt = None
        if language in ("Kotlin", "TypeScript"):
            m = _RET_COLON.search(line)
            rt = m.group(1) if m else None
        elif language == "Python":
            m = _RET_PY.search(line)
            rt = m.group(1) if m else None
        elif language in ("Java", "CSharp"):
            m = re.search(
                r"([A-Z][\w$]*)(?:<[^<>]*>)?(?:\[\])*\s+" + re.escape(name) + r"\s*\(",
                line,
            )
            rt = m.group(1) if m else None
        elif language == "Ruby":
            body = (
                line.split(";", 1)[1]
                if ";" in line
                else (masked[i + 1][0] if i + 1 < len(masked) else "")
            )
            fm = _RB_FACTORY_BODY.match(body)
            rt = fm.group(1) if fm else None
        if rt:
            rets[(encl, name)] = rt.split(".")[-1].rstrip("?")
    return rets


def _kind_name(language: str, keyword: str, name: str) -> str:
    if keyword == "def_self":
        # Ruby `def self.x` — the reference's distinct SingletonMethod
        # definition type (parser RubyDefinitionType::SingletonMethod)
        return "SingletonMethod"
    if language == "Kotlin" and keyword == "object":
        # kotlin/analyzer.rs:293-294: Object and CompanionObject SIMPLIFY to
        # Class before indexing — only Ruby/Rust modules stay Module
        return "Class"
    mapped = _KIND_BY_KEYWORD.get(keyword)
    if mapped:
        return mapped
    if language in ("Python", "Ruby"):
        return "Method"
    return "Function"


def _match_def(language: str, line: str):
    """(indent, keyword, name) of a definition on this line, else None."""
    if language == "Java":
        m = _JAVA_TYPE.match(line)
        if m:
            # `@interface` (AnnotationDeclaration) indexes as a Class
            kw = "class" if m.group(2) == "@" else m.group(3)
            return len(m.group(1)), kw, m.group(4)
        m = _JAVA_METHOD.match(line)
        if m:
            return len(m.group(1)), "method", m.group(2)
        m = _CTOR.match(line)
        if m:
            return len(m.group(1)), "method", m.group(2)
        # fields are deliberately NOT definitions: the reference skips
        # LocalVariable/Parameter/Field for Java ("We don't want to index
        # local variables, parameters, or fields", java/analyzer.rs:64-69)
        # — the declared type still feeds receiver resolution and the
        # initializer's calls still extract (caller = the class), both via
        # the non-def branch (_JAVA_VAR_DECL + receiver_calls)
        m = _JAVA_METHOD_BARE.match(line)
        if m:
            return len(m.group(1)), "method", m.group(2)
        return None
    if language == "Kotlin":
        m = _KT_COMPANION.match(line)
        if m:
            # nameless companion scope → a frame literally named Companion,
            # matching the reference's Foo.Companion.companionFoo FQNs
            return len(m.group(1)), "object", "Companion"
        m = _KT_DEF.match(line)
        return (len(m.group(1)), m.group(2), m.group(3)) if m else None
    if language == "CSharp":
        m = _CS_TYPE.match(line)
        if m:
            # `record struct` / `record class` normalize to `record` (the
            # compound kind is a record either way; csharp.rs:252 Record →
            # Class)
            return len(m.group(1)), m.group(2).split()[0], m.group(3)
        m = _CS_PROP.match(line)
        if m:
            return len(m.group(1)), "property", m.group(2)
        # delegate before method: its signature shape also matches _CS_METHOD
        m = _CS_DELEGATE.match(line)
        if m:
            return len(m.group(1)), "delegate", m.group(2)
        # indexer / finalizer / operator before method (csharp.rs:245-297:
        # Indexer → Property, Finalizer → InstanceMethod, Operator →
        # StaticMethod; names are the source tokens — see COVERAGE.md)
        m = _CS_INDEXER.match(line)
        if m:
            return len(m.group(1)), "property", "this"
        m = _CS_FINALIZER.match(line)
        if m:
            return len(m.group(1)), "method", "~" + m.group(2)
        m = _CS_CONV_OPERATOR.match(line)
        if m:
            return len(m.group(1)), "method", "operator " + m.group(2)
        m = _CS_OPERATOR.match(line)
        if m:
            return len(m.group(1)), "method", "operator" + m.group(2).replace(" ", "")
        m = _CS_METHOD.match(line)
        if m:
            return len(m.group(1)), "method", m.group(2)
        m = _CTOR.match(line)
        if m:
            return len(m.group(1)), "method", m.group(2)
        m = _CS_METHOD_BARE.match(line)
        if m:
            return len(m.group(1)), "method", m.group(2)
        return None
    if language == "Rust":
        m = _RS_DEF.match(line)
        if m:
            return len(m.group(1)), m.group(2), m.group(3)
        m = _RS_IMPL.match(line)
        if m:
            return len(m.group(1)), "impl", m.group(2)
        return None
    return None


_BRACE_IMPORTS = {
    "Java": (_JAVA_IMPORT, "."),
    "Kotlin": (_KT_IMPORT, "."),
    "CSharp": (_CS_IMPORT, "."),
    "Rust": (_RS_IMPORT, "::"),
}


_NAV_OPS = ("super().", "!!.", "?.", "&.")  # longest-first; all collapse to a dot


def _normalize_nav(line: str) -> tuple[str, list[int]]:
    """Collapse safe-navigation / assertion / zero-arg-super operators to a
    plain dot, returning (normalized_line, shift) where shift[j] is the
    number of source chars deleted before normalized index j — so the true
    source column of normalized column j is ``j + shift[j]``. Length-aware
    because the collapse deletes chars and emitted start_byte/end_byte must
    keep pointing at the real source (reference call locations are exact)."""
    if not any(op[:-1] in line for op in _NAV_OPS):
        return line, []
    out: list[str] = []
    shift: list[int] = []
    deleted = 0
    i, n = 0, len(line)
    while i < n:
        for op in _NAV_OPS:
            if line.startswith(op, i):
                keep = "super." if op == "super()." else "."
                for ch in keep:
                    out.append(ch)
                    shift.append(deleted)
                deleted += len(op) - len(keep)
                i += len(op)
                break
        else:
            out.append(line[i])
            shift.append(deleted)
            i += 1
    return "".join(out), shift


def _extract_one(path: str, language: str, text: str) -> Iterator[tuple]:
    """Indentation-tracked extraction for one file, with definition rows
    carrying their full line span: a definition's end_line is the line
    before the next same-or-lower-indent definition (or EOF) — the regex
    stand-in for the reference's tree-sitter node extents
    (DefinitionNode start_line/end_line, schema/init.rs:30-47), which the
    get_references/read_definitions context windows clamp against."""
    spans: list[tuple[str, int, int]] = []
    rows = list(_extract_one_scan(path, language, text, spans))
    if spans:
        ends = {(n, d): e for n, d, e in spans}
        patched = []
        for r in rows:
            if r[2] == "definition":
                e = ends.get((r[3], r[8]))
                if e is not None and e > r[9]:
                    r = r[:9] + (e,) + r[10:]
            patched.append(r)
        rows = patched
    return iter(rows)


def _extract_one_scan(
    path: str, language: str, text: str, spans: list[tuple[str, int, int]]
) -> Iterator[tuple]:
    """Indentation-tracked extraction for one file."""
    def_re, imp_re = {
        "Python": (_PY_DEF, _PY_IMPORT),
        "Ruby": (_RB_DEF, _RB_IMPORT),
        "TypeScript": (_TS_DEF, _TS_IMPORT),
    }.get(language, (None, None))
    brace = _BRACE_IMPORTS.get(language)
    if def_re is None and brace is None:
        return
    type_kws = {"class", "module", "interface", "enum", "record", "struct", "object", "impl"}
    stack: list[tuple[int, str, str]] = []  # (indent, name, keyword)
    byte_off = 0
    pkg: str | None = None  # Java/Kotlin `package` declaration
    local_types: dict[str, str] = {}  # per-def local var → constant type
    local_names: set[str] = set()  # per-def assigned locals (Ruby bare-RHS)
    enum_closed: set[tuple] = set()  # enum frames past their `;` constants section
    ivar_types: dict[str, str] = {}  # per-file @ivar / field → type
    class_supers: dict[str, str] = {}  # per-file class → superclass (super.x())
    fun_ret_types: dict[str, str] = {}  # Kotlin expression-bodied fun → type
    method_returns: dict[tuple[str, str], str] = {}  # (type, method) → return type

    def row(kind, name, parent, dtype, ipath, alias, ln, line, col, width,
            receiver_type=None, call_flavor=None, member_type=None):
        return (
            path, language, kind, name, parent, dtype, ipath, alias,
            ln, ln, col, col + width, byte_off + col, byte_off + col + width,
            receiver_type, call_flavor, member_type,
        )

    def scope_names():
        names = [f[1] for f in stack if f[1]]  # sclass frames are nameless
        if language in ("Java", "Kotlin"):
            # package declaration prefixes the scope (reference Java/Kotlin
            # FQNs are package-based: com.example.app.Foo.bar); files in the
            # unnamed package fall back to the path-derived module prefix
            # so FQNs stay unique
            prefix = pkg if pkg else path.rsplit(".", 1)[0].replace("/", ".")
            names = prefix.split(".") + names
        elif language == "CSharp" and pkg:
            # C# FQNs lead with the namespace when one is declared
            # (csharp.rs:301); no declaration → bare type-rooted FQN
            # (fqn.len()==1 is top-level there too)
            names = pkg.split(".") + names
        return names

    def enclosing_type() -> str | None:
        for f in reversed(stack):
            if f[2] in type_kws:
                return f[1]
        return None

    def receiver_calls(line, regex, ln):
        """Receiver-typed call emission shared by Ruby and Java; unresolvable
        receivers are dropped, like the reference's expression resolver."""
        enclosing = ".".join(scope_names()) or None
        if enclosing is None:
            return
        # safe-navigation / assertion operators are transparent to call
        # resolution: Kotlin `u?.m()` / `u!!.m()`, TS `o?.m()`, Ruby
        # `u&.m()`, C# `u?.M()`, Rust `f()?.m()` all dispatch on the same
        # receiver the plain dot would (tree-sitter's navigation_expression
        # keeps the receiver node either way). Normalization DELETES chars,
        # so a shift map carries match columns back to true source offsets
        # (build.py dedups on start_byte — locations must stay faithful).
        line, shift = _normalize_nav(line)

        def oc(col: int) -> int:
            """Original-source column for a normalized-line column."""
            return col + (shift[col] if col < len(shift) else shift[-1] if shift else 0)

        def resolve_recv(recv: str) -> tuple[str | None, str]:
            # dotted receiver paths (TS `UserManagement.User.x`, Ruby
            # `A::B.x`) resolve through the LAST path segment
            segs = recv.replace("::", ".").split(".")
            last = segs[-1]
            if recv in ("this", "self"):
                return enclosing_type(), "instance"
            if recv in ("super", "base"):
                # super.m() / C# base.M() → the enclosing class's recorded
                # superclass (kotlin `class Foo : Bar()`, C# `class Foo :
                # Bar`; the reference resolves into the parent hierarchy)
                return class_supers.get(enclosing_type() or ""), "instance"
            if recv.startswith("@"):
                return ivar_types.get(recv[1:]), "instance"
            if (
                language == "Kotlin"
                and len(segs) >= 2
                and re.fullmatch(r"[A-Z][A-Z0-9_]*", last)
            ):
                # Enum.ENUM_VALUE_1.enumMethod() — the enum CONSTANT's type
                # is the enum class (the preceding segment)
                return segs[-2], "instance"
            if last[0].isupper():
                return last, "singleton"
            if len(segs) == 2 and segs[0] in ("this", "self"):
                # `this.field.m()` — the field's declared type
                return ivar_types.get(last), "instance"
            if (
                language == "Kotlin"
                and len(segs) == 2
                and (local_types.get(segs[0]) or ivar_types.get(segs[0]))
            ):
                # `x.prop.method()` with x typed: one property hop, encoded
                # Type#prop — the build resolves prop through the global
                # extension/member map (kotlin/tests.rs:517-538,
                # extendMe.reversed.printValue() via the cross-file
                # extension property's result type)
                base = local_types.get(segs[0]) or ivar_types.get(segs[0])
                return base + "#" + last, "instance"
            if (
                language == "Ruby"
                and len(segs) == 2
                and (local_types.get(segs[0]) or ivar_types.get(segs[0]))
            ):
                # Ruby parenless chain `user.profile.display_name`: the
                # mid segment is a method whose factory-inferred return
                # type carries the tail (ruby/type_map.rs chained calls)
                base = local_types.get(segs[0]) or ivar_types.get(segs[0])
                return method_returns.get((base, segs[1])), "instance"
            if len(segs) == 1:
                # locals first, then fields (Java fields are bare names)
                return local_types.get(recv) or ivar_types.get(recv), "instance"
            return None, "instance"

        for cm in regex.finditer(line):
            recv, callee = cm.group(1), cm.group(2)
            # `new` is call noise everywhere EXCEPT Rust, where `Type::new()`
            # is the canonical constructor associated fn; print/puts are
            # BARE-call noise only — a receiver-qualified x.print() is a
            # real method call (kotlin/tests.rs:541-551 asserts
            # externalType.print() → the ExternalType.print extension)
            if (
                callee in _KEYWORDS
                and callee not in ("print", "puts")
                and not (language == "Rust" and callee == "new")
            ):
                continue
            # constructor syntax (`new Foo.Bar(`) is a ctor call, emitted by
            # the _JV_NEW pass — not a receiver-method call on Foo
            if re.search(r"\bnew\s+[\w.]*$", line[: cm.start(1)]):
                continue
            rtype, flavor = resolve_recv(recv)
            if rtype is None:
                continue
            col = oc(cm.start(2))
            yield row(
                "call", callee, enclosing, None, None, None, ln, line,
                col, len(callee), receiver_type=rtype, call_flavor=flavor,
            )
        # one-hop chain tails — `u.name().shout()`: the mid call's DECLARED
        # return type (method_returns pre-scan) types the tail's receiver,
        # the regex stand-in for tree-sitter type inference on chained
        # navigation. The main pass above already emitted the first hop.
        chain_re = _CHAIN_TAIL_CS if language == "CSharp" else _CHAIN_TAIL
        for hm in chain_re.finditer(line):
            recv, mid, tail = hm.group(1), hm.group(2), hm.group(3)
            if tail in _KEYWORDS or mid in _KEYWORDS:
                continue
            rt1, _ = resolve_recv(recv)
            rt2 = None
            probe = rt1.split("#", 1)[0] if rt1 else None
            # supers are keyed by LAST dotted segment, so `class Foo(proto.Foo)`
            # self-maps and cross-namespace pairs cycle — bound the climb by a
            # visited set or a single hung source file stalls the whole extract
            # stage
            seen_supers: set[str] = set()
            while probe and probe not in seen_supers:
                seen_supers.add(probe)
                rt2 = method_returns.get((probe, mid))
                if rt2 is not None:
                    break
                probe = class_supers.get(probe)
            if rt2 is not None:
                yield row(
                    "call", tail, enclosing, None, None, None, ln, line,
                    oc(hm.start(3)), len(tail), receiver_type=rt2,
                    call_flavor="instance",
                )
        if language == "Ruby":
            # parenless chains (`user.profile.display_name`): same one-hop
            # rule through the factory-inferred return type
            for hm in _RB_CHAIN_TAIL.finditer(line):
                recv, mid, tail = hm.group(1), hm.group(2), hm.group(3)
                if tail in _KEYWORDS or mid in _KEYWORDS:
                    continue
                rt1, _ = resolve_recv(recv)
                rt2 = method_returns.get((rt1, mid)) if rt1 else None
                if rt2 is not None:
                    yield row(
                        "call", tail, enclosing, None, None, None, ln, line,
                        oc(hm.start(3)), len(tail), receiver_type=rt2,
                        call_flavor="instance",
                    )

    masked = _mask_text(language, text)
    originals = text.split("\n")
    method_returns.update(_scan_method_returns(language, masked))
    # Instance-variable typing is CLASS-level, not stream-order: an ivar
    # assigned in a later-defined method (`@user = User.find(...)` inside a
    # before_action helper) types receivers in methods defined above it.
    # The reference's type map collects these in its own pass
    # (ruby/type_map.rs; python/analyzer.rs:148-218), so pre-scan the masked
    # lines; in-stream assignments below still update flow-order.
    if language == "Ruby":
        for _pl, _ in masked:
            _pv = _RB_IVAR_ASSIGN.match(_pl)
            if _pv:
                ivar_types.setdefault(_pv.group(1), _pv.group(2).split("::")[-1])
    elif language == "Python":
        for _pl, _ in masked:
            _pv = _PY_SELF_ASSIGN.match(_pl)
            if _pv:
                ivar_types.setdefault(_pv.group(1), _pv.group(2))
    skip_lines: set[int] = set()  # continuation lines consumed by a joined signature
    rs_macro_ind: int | None = None  # inside a macro_rules! body (Rust)
    rs_macro_ln = -1
    py_depth = 0  # running bracket depth over masked lines (Python)
    py_cont = False  # previous line ended with a backslash continuation
    # Kotlin primary-constructor properties found on a class header's
    # CONTINUATION lines are emitted when the loop reaches that line, so
    # their byte offsets come from the right line_bytes accumulation
    kt_pending_props: dict[int, list] = {}
    kt_header_lines: set[int] = set()
    for ln, (line, imp_line) in enumerate(masked):
        # byte offsets always advance by the ORIGINAL line's encoded length —
        # masking is char-preserving, not byte-preserving
        line_bytes = len(originals[ln].encode("utf-8", "replace")) + 1
        if ln in skip_lines:
            byte_off += line_bytes
            continue
        for _pname, _pcol, _pparent in kt_pending_props.pop(ln, ()):
            yield row(
                "definition", _pname, _pparent, "Property",
                None, None, ln, line, _pcol, len(_pname),
            )
        if language == "Python":
            # indentation IS scope: any real STATEMENT at indent <= an open
            # frame's indent ends that frame right here, not lazily at the
            # next def (lazy popping gave a def inside a module-level
            # `if:` block the previous def as parent — ast-differential
            # catch, r8). Not statements: blanks, comments, bracket/backslash
            # continuations, and multiline-string tails (the masker keeps the
            # closing delimiter, so those lines start with a quote).
            _s = line.strip()
            if (
                _s
                and py_depth == 0
                and not py_cont
                and _s[0] not in "#\"'"
                and ln not in skip_lines
            ):
                _ind = len(line) - len(line.lstrip())
                while stack and stack[-1][0] >= _ind and not (
                    len(stack[-1]) > 3
                    and stack[-1][3] == ln
                ):
                    _f = stack.pop()
                    if _f[3] is not None:
                        spans.append((_f[1], _f[3], ln - 1))
            py_depth += (
                line.count("(") + line.count("[") + line.count("{")
                - line.count(")") - line.count("]") - line.count("}")
            )
            if py_depth < 0:
                py_depth = 0
            py_cont = line.rstrip().endswith("\\")
        if language == "Rust":
            # macro_rules! bodies are TOKEN TREES, not items — tree-sitter
            # parses them as macro_definition with no child definitions, so
            # `struct X;` / `fn y()` text inside must not extract (r8
            # hostile-generator catch). Suppress every line of the body:
            # from the `macro_rules!` line until the first non-blank line
            # back at (or left of) the opening indent.
            if rs_macro_ind is not None:
                _ms = line.strip()
                if _ms and ln > rs_macro_ln and (
                    len(line) - len(line.lstrip())
                ) <= rs_macro_ind:
                    rs_macro_ind = None  # body closed; process this line
                else:
                    byte_off += line_bytes
                    continue
            _mm = _RS_MACRO_RULES.match(line)
            if _mm is not None:
                rs_macro_ind, rs_macro_ln = len(_mm.group(1)), ln
                byte_off += line_bytes
                continue
        rb_endless = False
        if def_re is not None:
            m = def_re.match(line)
            if m and language == "Ruby":
                kw = "def_self" if (m.group(2) == "def" and m.group(3)) else m.group(2)
                if kw == "def":
                    _d_ind = len(m.group(1))
                    _d_host = next(
                        (f for f in reversed(stack) if f[0] < _d_ind), None
                    )
                    if _d_host is not None and _d_host[2] == "sclass":
                        kw = "def_self"  # inside `class << self`
                rb_endless = kw in ("def", "def_self") and bool(
                    _RB_ENDLESS.match(line)
                )
                hit = (len(m.group(1)), kw, m.group(4))
                name_col = m.start(4)
            elif m:
                hit = (len(m.group(1)), m.group(2), m.group(3))
                name_col = m.start(3)
            else:
                hit, name_col = None, None
            if hit is None and language == "Ruby":
                sm = _RB_SCLASS.match(line)
                if sm:
                    hit = (len(sm.group(1)), "sclass", "")
                    name_col = None
            if hit is None and language == "TypeScript":
                dm = _TS_AMBIENT_MODULE.match(line)
                if dm:
                    # ambient module (`declare module "pkg" {`): a scope
                    # frame so body members don't leak into the previous
                    # top-level frame; the quoted name lives in the string
                    # literal, so it is read from the string-intact import
                    # view (the code view blanks it)
                    amb = imp_line[dm.end():].split('"', 1)[0]
                    hit, name_col = (len(dm.group(1)), "namespace", amb or "module"), None
                am = _TS_ARROW.match(line) if hit is None else None
                ne = (
                    _TS_NAMED_EXPR.match(line)
                    if am is None and hit is None
                    else None
                )
                if am:
                    hit, name_col = (len(am.group(1)), "function", am.group(2)), None
                elif ne:
                    # named class/function expression folds to Class/Function
                    # under the declarator name (typescript.rs:286-303)
                    kw = "class" if ne.group(3) else "function"
                    hit, name_col = (len(ne.group(1)), kw, ne.group(2)), None
                if hit is None:
                    fa = _TS_FIELD_ARROW.match(line)
                    if fa:
                        _fa_ind = len(fa.group(1))
                        _encl = next(
                            (f[2] for f in reversed(stack) if f[0] < _fa_ind), None
                        )
                        if _encl == "class":
                            hit, name_col = (_fa_ind, "function", fa.group(2)), None
                if hit is None:
                    mm = _TS_METHOD.match(line)
                    if mm is None:
                        hm = _TS_METHOD_HEAD.match(line)
                        if hm and hm.group(3) not in _KEYWORDS:
                            # signature continues on following lines: accept
                            # iff the params close and a `{` opens within the
                            # next few masked lines (before any `;`/`=`)
                            joined = line
                            for nxt_line, _ in masked[ln + 1 : ln + 5]:
                                joined += " " + nxt_line.strip()
                            probe = joined[hm.end(3):]
                            if (
                                _TS_METHOD_CONT.search(probe)
                                and ";" not in probe.split("{", 1)[0]
                                and "=" not in probe.split("{", 1)[0]
                            ):
                                mm = hm
                    if mm and mm.group(3) not in _KEYWORDS:
                        # only a class/interface body hosts methods: find the
                        # innermost frame that would survive this indent
                        m_indent = len(mm.group(1))
                        host = next(
                            (f[2] for f in reversed(stack) if f[0] < m_indent),
                            None,
                        )
                        if host in ("class", "interface"):
                            hit = (m_indent, "method", mm.group(3))
                            name_col = mm.start(3)
        else:
            hit = _match_def(language, line)
            name_col = None
            if hit is None and language == "CSharp":
                nm = _CS_NS.match(line)
                if nm:
                    pkg = nm.group(1)
                pm = _CS_PROP_HEAD.match(line)
                if pm:
                    nxt = [
                        s for s in
                        (l.strip() for l, _ in masked[ln + 1 : ln + 4]) if s
                    ]
                    if nxt and _CS_PROP_CONT.match(" ".join(nxt)):
                        hit = (len(pm.group(1)), "property", pm.group(2))
            elif hit is None and language == "Java":
                pm = _JAVA_PKG.match(line)
                if pm:
                    pkg = pm.group(1)
            if hit is None and language in ("Java", "CSharp") and _BRACE_METHOD_HEAD.match(line):
                # return type wrapped before the member name: join physical
                # continuation lines (≤4, stopping at the signature's `{`
                # or `;`) and re-run the def regexes on the joined text;
                # start_line stays the head line. Consumed lines are skipped
                # outright — they are signature fragments, not statements.
                joined = line
                used: list[int] = []
                for off in range(1, 5):
                    if ln + off >= len(masked):
                        break
                    nxt = masked[ln + off][0]
                    joined = joined.rstrip() + " " + nxt.strip()
                    used.append(ln + off)
                    if "{" in nxt or ";" in nxt:
                        break
                jhit = _match_def(language, joined)
                if jhit is not None:
                    hit = jhit
                    line = joined
                    skip_lines.update(used)
            elif hit is None and language == "Kotlin":
                pm = _KT_PKG.match(line)
                if pm:
                    pkg = pm.group(1)
                ep = _KT_EXT_PROP.match(line)
                if ep:
                    # extension property: record (receiver, name, result
                    # type) as an ext_member typing row for the one-hop
                    # member resolution (kotlin/tests.rs:517-538); the
                    # Property DEFINITION row is emitted below

                    ptype = ep.group(3).split(".")[-1] if ep.group(3) else None
                    if ptype is None:
                        for off in range(1, 4):
                            if ln + off >= len(masked):
                                break
                            gm = _KT_GETTER.match(masked[ln + off][0])
                            if gm:
                                rhs = gm.group(1).strip()
                                cm_ = _KT_CTOR_RHS.match(rhs)
                                if cm_:
                                    ptype = cm_.group(1).split(".")[-1]
                                elif _KT_EXPR_RHS.match(rhs):
                                    ptype = _kt_expr_ctor(rhs, masked, ln + off)
                                break
                    if ptype:
                        yield row(
                            "ext_member", ep.group(2),
                            ".".join(scope_names()) or None, None, None,
                            None, ln, line, ep.start(2), len(ep.group(2)),
                            receiver_type=ep.group(1).split(".")[-1],
                            member_type=ptype,
                        )
                # effective enclosing chain at this line's indent — frames a
                # def line HERE would pop must not contribute (non-def lines
                # never pop, so a finished fun's frame may still linger)
                def _kt_eff_parent(_ind: int) -> str | None:
                    names = [f[1] for f in stack if f[0] < _ind]
                    prefix = pkg if pkg else path.rsplit(".", 1)[0].replace("/", ".")
                    return ".".join(prefix.split(".") + names) or None

                if ep:
                    # the extension property is ALSO a Property definition
                    # with a receiver-free FQN, like extension functions
                    # (KotlinDefinitionType::Property)
                    yield row(
                        "definition", ep.group(2),
                        _kt_eff_parent(len(line) - len(line.lstrip())),
                        "Property",
                        None, None, ln, line, ep.start(2), len(ep.group(2)),
                        receiver_type=ep.group(1).split(".")[-1],
                    )
                else:
                    # class-body / top-level property: Property definition
                    # when the innermost frame surviving this indent is a
                    # TYPE or absent — function bodies are LocalVariable in
                    # the reference and simplify to None (not indexed).
                    # Header continuation lines are the PRIMARY-constructor
                    # scan's territory (kt_header_lines)
                    pm2 = _KT_PROP.match(line)
                    if pm2 and ln not in kt_header_lines:
                        _p_ind = len(line) - len(line.lstrip())
                        _host = next(
                            (f for f in reversed(stack) if f[0] < _p_ind), None
                        )
                        if _host is None or _host[2] in type_kws:
                            yield row(
                                "definition", pm2.group(2),
                                _kt_eff_parent(_p_ind), "Property",
                                None, None, ln, line, pm2.start(2),
                                len(pm2.group(2)),
                            )
                cm2 = _KT_SECONDARY_CTOR.match(line)
                if cm2:
                    _c_ind = len(cm2.group(1))
                    _chost = next(
                        (f for f in reversed(stack) if f[0] < _c_ind), None
                    )
                    if _chost is not None and _chost[2] in (
                        "class", "enum", "object",
                    ):
                        # pop finished same-indent sibling frames (a fun
                        # body that ended above), exactly like a def line
                        while stack and stack[-1][0] >= _c_ind:
                            _f = stack.pop()
                            if _f[3] is not None:
                                spans.append((_f[1], _f[3], ln - 1))
                        yield row(
                            "definition", "<init>",
                            ".".join(scope_names()) or None, "Constructor",
                            None, None, ln, line,
                            line.find("constructor"), len("constructor"),
                        )
                        # open a fun-like frame: ctor-body vals become
                        # LocalVariable (unindexed), nested lambdas parent
                        # to Class.<init>, and params type the body's locals
                        local_types.clear()
                        local_names.clear()
                        for _pn, _pt in _param_types(language, line):
                            local_types[_pn] = _pt
                            local_names.add(_pn)
                        stack.append((_c_ind, "<init>", "fun", ln))
        if hit:
            indent, kw, name = hit
            if (
                language == "Kotlin"
                and kw == "class"
                and re.search(r"\benum\s+class\b", line)
            ):
                # `enum class` frames must read as enums so their entries
                # extract (KotlinDefinitionType::EnumEntry); the definition
                # row's kind is Class either way
                kw = "enum"
            while stack and stack[-1][0] >= indent:
                _f = stack.pop()
                if _f[3] is not None:
                    # the popped definition's extent ends on the line
                    # before the one hosting the new definition
                    spans.append((_f[1], _f[3], ln - 1))
            if (
                kw == "impl"
                or kw == "sclass"
                or (kw in ("namespace", "module") and language == "TypeScript")
            ):
                # scope frame only: Rust impl blocks, Ruby `class << self`
                # (transparent: empty name, contained defs are singleton
                # methods) and TS namespaces (incl. the legacy `module X {}`
                # internal-module syntax) contribute to contained FQNs but
                # emit no definition row — the reference analyzer skips
                # Namespace definitions outright (typescript.rs:42-44)
                stack.append((indent, name, kw, None))
                byte_off += line_bytes
                continue
            if kw in ("def", "def_self", "method", "function", "fun"):
                local_types.clear()  # new method scope: locals reset
                local_names.clear()
                for _pn, _pt in _param_types(language, line):
                    local_types[_pn] = _pt
                    local_names.add(_pn)
            parent = ".".join(scope_names()) or None
            col = name_col if name_col is not None else max(line.find(name), 0)
            ext_recv = None
            if language == "Kotlin" and kw == "fun":
                em = _KT_EXT_FUN.search(line)
                if em:
                    # extension function: FQN is receiver-free, but the
                    # receiver type rides on the row so x.f() calls with
                    # x : ExtendMe resolve into this definition
                    ext_recv = em.group(1).split(".")[-1]
            kind = _kind_name(language, kw, name)
            if (
                language == "CSharp"
                and kind == "Method"
                and stack
                and stack[-1][1] == name
                and stack[-1][2] in type_kws
            ):
                # a member named like its host type is a constructor —
                # CSharpDefinitionType::Constructor, whose hierarchy edge
                # is ClassToConstructor (csharp.rs:196-199), unlike Java
                # where ctors stay Method/ClassToMethod
                kind = "Constructor"
            if language == "Python" and kind == "Method":
                # the reference splits Python defs by host: class-hosted
                # defs are Method, module-level and fn-nested defs are
                # Function (python/analyzer.rs:1051-1060 simplify table —
                # FunctionToFunction/FunctionToLambda arms exist ONLY for
                # the Function kind). Ruby keeps Method everywhere (its
                # inventory has no Function).
                if not stack or stack[-1][2] != "class":
                    kind = "Function"
            if (
                language == "Rust"
                and kw == "fn"
                and stack
                and (stack[-1][2] in type_kws or stack[-1][2] in ("trait", "union"))
            ):
                # fn hosted in a struct/enum/trait/union/impl body is the
                # reference's Method / AssociatedFunction — both map their
                # hierarchy edge to CLASS_TO_METHOD (rust.rs:301-317); only
                # free functions stay Function. `trait`/`union` frames keep
                # their literal kw (they're not in the cross-language
                # type_kws set), so they're named here explicitly — trait
                # default methods were staying Function (ADVICE r7)
                kind = "Method"
            yield row(
                "definition", name, parent, kind,
                None, None, ln, line, col, len(name),
                receiver_type=ext_recv,
            )
            if rb_endless:
                # a one-line complete definition: no frame, or the next
                # def would nest under it; extent is the line itself
                spans.append((name, ln, ln))
                byte_off += line_bytes
                continue
            stack.append((indent, name, kw, ln))
            if language == "Kotlin" and kw in ("class", "enum"):
                # primary-constructor `val`/`var` parameters declare class
                # Properties (kotlin/analyzer.rs:221-224); plain parameters
                # are Parameter → simplify None. Head-line params emit now;
                # continuation-line params are deferred to their own line
                # (correct byte offsets) and the body-property branch is
                # kept off every header line
                _cparent = ".".join(scope_names()) or None
                _props, _plast = _kt_primary_ctor_props(
                    masked, ln, col + len(name)
                )
                kt_header_lines.update(range(ln + 1, _plast + 1))
                for _pname, _pli, _pcol in _props:
                    if _pli == ln:
                        yield row(
                            "definition", _pname, _cparent, "Property",
                            None, None, ln, line, _pcol, len(_pname),
                        )
                    else:
                        kt_pending_props.setdefault(_pli, []).append(
                            (_pname, _pcol, _cparent)
                        )
            if language == "CSharp" and kw == "record":
                # positional record parameters are init-only PROPERTIES of
                # the record (records simplify to Class, csharp.rs:252;
                # Property is first-class in the C# inventory)
                _rparent = ".".join(scope_names()) or None
                for _pname, _pli, _pcol in _cs_record_props(
                    masked, ln, col + len(name)
                ):
                    if _pli == ln:
                        yield row(
                            "definition", _pname, _rparent, "Property",
                            None, None, ln, line, _pcol, len(_pname),
                        )
                    else:
                        kt_pending_props.setdefault(_pli, []).append(
                            (_pname, _pcol, _rparent)
                        )
            if language in _ENUM_ENTRY_KIND and kw == "enum" and "{" in line:
                # one-line enum body (`enum Mode { Fast, Slow }`): members
                # never reach the per-line scan, so pull them off the brace
                # body here
                body_ix = line.index("{")
                for vname, vcol in _enum_entries(line[body_ix + 1 :]):
                    yield row(
                        "definition", vname,
                        ".".join(scope_names()) or None,
                        _ENUM_ENTRY_KIND[language],
                        None, None, ln, line, body_ix + 1 + vcol,
                        len(vname),
                    )
            if (
                language == "Rust"
                and kw in ("struct", "union")
                and "{" in line
            ):
                # one-line body (`pub struct Conn { host: String }`): field
                # names are the depth-0 `name:` tokens of the brace body
                body_ix = line.index("{")
                seg = line[body_ix + 1 :]
                depth = 0
                anchor = True
                k = 0
                while k < len(seg):
                    ch = seg[k]
                    if ch in "(<[":
                        depth += 1
                    elif ch in ")>]":
                        depth = max(0, depth - 1)
                    elif depth == 0 and ch == ",":
                        anchor = True
                    elif depth == 0 and anchor and (ch.islower() or ch == "_"):
                        fm_ = re.match(
                            r"(?:pub(?:\([\w:]+\))?\s+)?([a-z_]\w*)\s*:",
                            seg[k:],
                        )
                        if fm_:
                            yield row(
                                "definition", fm_.group(1),
                                ".".join(scope_names()) or None, "Field",
                                None, None, ln, line,
                                body_ix + 1 + k + fm_.start(1),
                                len(fm_.group(1)),
                            )
                            k += fm_.end(1)
                        else:
                            k += 1
                        anchor = False
                        continue
                    elif ch not in " \t":
                        anchor = False
                    k += 1
            if language == "TypeScript" and kw == "class":
                ts_ih = _TS_EXTENDS.search(line)
                if ts_ih:
                    # `extends` clause → same inheritance-chain entry as the
                    # Ruby superclass: unresolved receiver-typed calls climb
                    # the chain (UserModel.create → BaseModel.create)
                    sup = ts_ih.group(1).split(".")[-1]
                    class_supers[name] = sup
                    yield row(
                        "inherits", sup, ".".join(scope_names()), None, None,
                        None, ln, line, ts_ih.start(1), len(ts_ih.group(1)),
                    )
            if language == "Ruby" and kw == "class":
                ih = _RB_INHERIT.search(line)
                if ih:
                    # superclass clause → inheritance-chain entry
                    # (scope_resolver.rs:142-149); child = the chain incl.
                    # the class just pushed
                    class_supers[name] = ih.group(1).split("::")[-1]
                    yield row(
                        "inherits", ih.group(1).split("::")[-1],
                        ".".join(scope_names()), None, None, None,
                        ln, line, ih.start(1), len(ih.group(1)),
                    )
            if language == "Python" and kw == "class":
                pih = _PY_INHERIT.match(line)
                if pih:
                    # `class A(B):` → inheritance-chain entry; receiver-typed
                    # calls unresolved on A climb to B
                    # (python/analyzer.rs:148-387 hierarchy lookup)
                    class_supers[name] = pih.group(1).split(".")[-1]
                    yield row(
                        "inherits", pih.group(1).split(".")[-1],
                        ".".join(scope_names()), None, None, None,
                        ln, line, pih.start(1), len(pih.group(1)),
                    )
            if language == "Java" and kw == "property":
                # typed field emitted as a property definition: the declared
                # type must STILL feed receiver resolution (`private static
                # final Logger logger = ...` types logger.info() in every
                # method), and the initializer's receiver calls
                # (LogManager.getLogger(...)) are real calls from the field
                vd = _JAVA_VAR_DECL.match(line)
                if vd:
                    ivar_types[vd.group(2)] = vd.group(1)
                yield from receiver_calls(line, _JV_RECV_CALL, ln)
            if language == "Java" and kw in ("class", "interface", "enum", "record"):
                # supertype clauses may wrap (`class Wide ⏎ extends Base {`):
                # extend the scanned declaration to the opening brace
                decl_src = line
                if "{" not in line:
                    for off in range(1, 4):
                        if ln + off >= len(masked):
                            break
                        decl_src = decl_src.rstrip() + " " + masked[ln + off][0].strip()
                        if "{" in masked[ln + off][0]:
                            break
                # generics-stripped copy: `<T extends Bound>` must not match
                decl = re.sub(r"<[^<>]*>", "", decl_src)
                sups: list[str] = []
                jex = _JAVA_EXTENDS.search(decl)
                if jex:
                    sups.append(jex.group(1).split(".")[-1])
                jim = _JAVA_IMPLEMENTS.search(decl)
                if jim:
                    for part in jim.group(1).split(","):
                        part = part.strip()
                        if part and part[0].isupper():
                            sups.append(part.split(".")[-1])
                if sups:
                    # super.m() resolves against the FIRST clause (the
                    # extends class when present); the chain-climb lookup
                    # in the build sees every clause as an inherits row
                    class_supers[name] = sups[0]
                    for sup in sups:
                        yield row(
                            "inherits", sup, ".".join(scope_names()), None,
                            None, None, ln, line, 0, len(sup),
                        )
            if language == "CSharp" and kw in ("class", "interface", "struct", "record"):
                csb = _CS_BASE.search(line)
                if csb:
                    sup = csb.group(1).split(".")[-1]
                    class_supers[name] = sup
                    yield row(
                        "inherits", sup, ".".join(scope_names()), None, None,
                        None, ln, line, csb.start(1), len(csb.group(1)),
                    )
            if language == "Kotlin":
                if kw == "fun":
                    fe = _KT_FUN_EXPR.search(line)
                    if fe:
                        # expression-bodied fun: infer the return type so
                        # `f(args).method()` receivers resolve through it
                        rt = _kt_expr_ctor(fe.group(1).strip(), masked, ln)
                        if rt:
                            fun_ret_types[name] = rt
                if name == "Companion" and kw == "object":
                    # the class reaches its companion's members through the
                    # lookup chain (reference resolves foo.companionFoo()
                    # into Foo.Companion.companionFoo)
                    if parent:
                        yield row(
                            "inherits", "Companion", parent, None, None,
                            None, ln, line, 0, len("Companion"),
                        )
                elif kw in ("class", "interface", "object"):
                    # LAST `: Type` on the line: constructor parameter
                    # annotations (`class Foo(val x: Int) : Bar()`) precede
                    # the supertype clause
                    kih = None
                    for kih in _KT_SUPER.finditer(line):
                        pass
                    if kih:
                        sup = kih.group(1).split(".")[-1]
                        class_supers[name] = sup
                        yield row(
                            "inherits", sup, ".".join(scope_names()), None,
                            None, None, ln, line, kih.start(1),
                            len(kih.group(1)),
                        )
        elif brace is not None:
            bim = brace[0].match(imp_line)
            if bim is None and language == "CSharp":
                am = _CS_USING_ALIAS.match(imp_line)
                if am:
                    tgt = am.group(2)
                    yield row(
                        "import", tgt.split(".")[-1], None, None,
                        tgt.rsplit(".", 1)[0] if "." in tgt else tgt,
                        am.group(1), ln, line, 0, len(line),
                    )
                    byte_off += line_bytes
                    continue
            if bim:
                # reference convention (java/tests.rs:292-303,
                # find_calls_to_imported_symbol("java.util", "ArrayList")):
                # import_path = the container/package, name = the last segment.
                # Wildcard imports (`import a.b.*` / `use x::*`) keep the
                # FULL package as import_path with name '*' — the
                # import_usage tool queries them by that package path
                # (import_usage/tool.rs:159-190 matches import_path
                # 'org.springframework.web.bind.annotation' for a `.*` line)
                base = bim.group(1)
                sep = brace[1]
                if re.search(r"(?:\.|::)\*", imp_line):
                    name_ = "*"
                    container = base.rstrip(".:")
                else:
                    name_ = base.split(sep)[-1]
                    container = base.rsplit(sep, 1)[0] if sep in base else base
                alias_ = bim.group(2) if bim.re.groups >= 2 else None
                yield row(
                    "import", name_, None, None, container, alias_,
                    ln, line, 0, len(line),
                )
            else:
                # enum members are DEFINITIONS with a CLASS_TO_ENUM_ENTRY /
                # CLASS_TO_METHOD edge (java/analyzer.rs:216, kotlin/
                # analyzer.rs:230, rust.rs:295): gated on the innermost frame
                # being an enum, and (Java/Kotlin) only until the `;` that
                # closes the constants section — a package-private enum
                # constructor after it must not read as a constant
                _line_ind = len(line) - len(line.lstrip())
                _eff_enum = next(
                    (f for f in reversed(stack) if f[0] < _line_ind), None
                )
                if (
                    language in _ENUM_ENTRY_KIND
                    and _eff_enum is not None
                    and _eff_enum[2] == "enum"
                ):
                    # one-line member frames (a field def) would be popped by
                    # the NEXT def line; pop them now so the enum is the real
                    # innermost scope for entry/constructor attribution
                    while stack and stack[-1][0] >= _line_ind:
                        _f2 = stack.pop()
                        if _f2[3] is not None:
                            spans.append((_f2[1], _f2[3], ln - 1))
                    if stack[-1] not in enum_closed:
                        emitted_entry = False
                        for vname, vcol in _enum_entries(line):
                            yield row(
                                "definition", vname,
                                ".".join(scope_names()) or None,
                                _ENUM_ENTRY_KIND[language],
                                None, None, ln, line, vcol,
                                len(vname),
                            )
                            emitted_entry = True
                        if language in ("Java", "Kotlin") and ";" in line:
                            enum_closed.add(stack[-1])
                        if emitted_entry:
                            # declaration syntax, not call sites (`Data(u32),`)
                            byte_off += line_bytes
                            continue
                    elif language == "Java" and re.match(
                        r"^\s*" + re.escape(stack[-1][1]) + r"\s*\(", line
                    ):
                        # package-private enum constructor (`Color(int c) {`)
                        # — a Constructor definition (the modifier-anchored
                        # _CTOR can't see it), never a bare call
                        yield row(
                            "definition", stack[-1][1],
                            ".".join(scope_names()) or None, "Method",
                            None, None, ln, line, line.find(stack[-1][1]),
                            len(stack[-1][1]),
                        )
                        byte_off += line_bytes
                        continue
                if language == "Rust":
                    # struct/union FIELD lines (rust.rs:287-292,317-322 —
                    # Fields are indexed, edge reuses CLASS_TO_METHOD via
                    # the build override map)
                    _f_ind = len(line) - len(line.lstrip())
                    _f_host = next(
                        (f for f in reversed(stack) if f[0] < _f_ind), None
                    )
                    if _f_host is not None and _f_host[2] in ("struct", "union"):
                        fm_ = _RS_FIELD.match(line)
                        if fm_:
                            yield row(
                                "definition", fm_.group(1),
                                ".".join(scope_names()) or None, "Field",
                                None, None, ln, line, fm_.start(1),
                                len(fm_.group(1)),
                            )
                            byte_off += line_bytes
                            continue
                ctor_cols: set[int] = set()
                if language == "Java":
                    vd = _JAVA_VAR_DECL.match(line)
                    if vd:
                        if enclosing_type() and not any(
                            k in ("method", "function") for k in (f[2] for f in stack)
                        ):
                            ivar_types[vd.group(2)] = vd.group(1)
                        else:
                            local_types[vd.group(2)] = vd.group(1)
                    yield from receiver_calls(line, _JV_RECV_CALL, ln)
                    enc = ".".join(scope_names()) or None
                    for nm_ in _JV_NEW.finditer(line):
                        cls = nm_.group(1).replace(" ", "").split(".")[-1]
                        col = nm_.end(1) - len(cls)
                        ctor_cols.add(col)
                        yield row(
                            "call", cls, enc, None, None, None,
                            ln, line, col, len(cls),
                        )
                elif language == "CSharp":
                    in_method = any(f[2] == "method" for f in stack)
                    cn = _CS_LOCAL_NEW.match(line)
                    if cn:
                        t = cn.group(2).split(".")[-1]
                        (local_types if in_method else ivar_types)[cn.group(1)] = t
                    else:
                        vd = _JAVA_VAR_DECL.match(line)
                        if vd:
                            (local_types if in_method else ivar_types)[
                                vd.group(2)
                            ] = vd.group(1)
                    yield from receiver_calls(line, _CS_RECV_CALL, ln)
                    enc_cs = ".".join(scope_names()) or None
                    for nm_ in _JV_NEW.finditer(line):
                        cls = nm_.group(1).replace(" ", "").split(".")[-1]
                        col = nm_.end(1) - len(cls)
                        ctor_cols.add(col)
                        yield row(
                            "call", cls, enc_cs, None, None, None,
                            ln, line, col, len(cls),
                        )
                elif language == "Rust":
                    rl = _RS_LET.match(line)
                    if rl and (rl.group(2) or rl.group(3)):
                        local_types[rl.group(1)] = rl.group(2) or rl.group(3)
                    yield from receiver_calls(line, _JV_RECV_CALL, ln)
                    yield from receiver_calls(line, _RS_ASSOC_CALL, ln)
                elif language == "Kotlin":
                    kl = _KT_LOCAL.match(line)
                    if kl:
                        t = None
                        if kl.group(2):
                            t = kl.group(2).split(".")[-1]
                        elif kl.group(3):
                            rhs = kl.group(3).strip()
                            cm_ = _KT_CTOR_RHS.match(rhs)
                            em_ = _KT_ENUM_RHS.match(rhs)
                            if cm_:
                                t = cm_.group(1).split(".")[-1]
                            elif em_:
                                t = em_.group(1).split(".")[-1]
                            elif _KT_EXPR_RHS.match(rhs):
                                # when/if/try expression: first branch ctor
                                t = _kt_expr_ctor(rhs, masked, ln)
                        if t:
                            # val in a fun body → local; top-level/class
                            # property → file-scoped (like Java fields)
                            if any(f[2] == "fun" for f in stack):
                                local_types[kl.group(1)] = t
                            else:
                                ivar_types[kl.group(1)] = t
                    yield from receiver_calls(line, _KT_RECV_CALL, ln)
                    enc_kt = ".".join(scope_names()) or None
                    if enc_kt:
                        for fm in _KT_FUNRET_RECV.finditer(line):
                            rt = fun_ret_types.get(fm.group(1))
                            if rt and fm.group(3) not in _KEYWORDS:
                                yield row(
                                    "call", fm.group(3), enc_kt, None, None,
                                    None, ln, line, fm.start(3),
                                    len(fm.group(3)), receiver_type=rt,
                                    call_flavor="instance",
                                )
                enclosing = ".".join(scope_names()) or None
                for cm in _CALL.finditer(line):
                    callee = cm.group(1)
                    if (
                        callee in _KEYWORDS
                        or callee in _CALL_NOISE
                        or cm.start(1) in ctor_cols
                    ):
                        continue
                    yield row(
                        "call", callee, enclosing, None, None, None,
                        ln, line, cm.start(1), len(callee),
                    )
        else:
            im = imp_re.match(imp_line)
            if im is None and language == "Python":
                po = _PY_IMPORT_OPEN.match(imp_line)
                if po:
                    # parenthesized (usually multi-line) name list: join
                    # continuation lines up to the closing paren and emit
                    # one import row per name, honoring per-name aliases
                    joined = imp_line.split("(", 1)[1]
                    if ")" not in joined:
                        for _nxt, nxt_imp in masked[ln + 1 : ln + 64]:
                            joined += " " + nxt_imp.strip()
                            if ")" in nxt_imp:
                                break
                    for nm in joined.split(")", 1)[0].split(","):
                        seg = [s.strip() for s in nm.split(" as ")]
                        if seg[0]:
                            yield row(
                                "import", seg[0], None, None, po.group(1),
                                seg[1] if len(seg) > 1 else None,
                                ln, line, 0, len(line),
                            )
                    byte_off += line_bytes
                    continue
            if im is None and language == "TypeScript":
                ns = _TS_NS_IMPORT.match(imp_line)
                if ns:
                    yield row(
                        "import", "*", None, None, ns.group(2), ns.group(1),
                        ln, line, 0, len(line),
                    )
                    byte_off += line_bytes
                    continue
                rx = _TS_REEXPORT.match(imp_line)
                if rx:
                    if rx.group(2):  # export * from "mod"
                        yield row(
                            "import", "*", None, None, rx.group(3), None,
                            ln, line, 0, len(line),
                        )
                    else:
                        for nm in rx.group(1).split(","):
                            seg = [s.strip() for s in nm.split(" as ")]
                            if seg[0]:
                                yield row(
                                    "import", seg[0], None, None, rx.group(3),
                                    seg[1] if len(seg) > 1 else None,
                                    ln, line, 0, len(line),
                                )
                    byte_off += line_bytes
                    continue
            if im is None and language == "TypeScript" and _TS_IMPORT_OPEN.match(imp_line):
                joined = imp_line
                for _nxt, nxt_imp in masked[ln + 1 : ln + 64]:
                    joined += " " + nxt_imp.strip()
                    if _TS_IMPORT_FROM.search(nxt_imp):
                        break
                im = imp_re.match(joined)
            if im:
                if language == "Python":
                    if im.group(1):  # from X import a, b
                        base = im.group(1)
                        for nm in (im.group(2) or "").split(","):
                            nm = nm.strip()
                            if nm:
                                yield row(
                                    "import", nm, None, None, base, im.group(3),
                                    ln, line, 0, len(line),
                                )
                    else:
                        yield row(
                            "import", im.group(4).split(".")[-1], None, None,
                            im.group(4), im.group(5), ln, line, 0, len(line),
                        )
                elif language == "Ruby":
                    base = im.group(1)
                    yield row(
                        "import", base.split("/")[-1], None, None, base, None,
                        ln, line, 0, len(line),
                    )
                else:  # TypeScript
                    default_imp, named, base = im.group(1), im.group(2), im.group(3)
                    if default_imp:
                        yield row(
                            "import", default_imp, None, None, base, None,
                            ln, line, 0, len(line),
                        )
                    for nm in (named or "").split(","):
                        nm = nm.strip()
                        if nm:
                            parts = nm.split(" as ")
                            yield row(
                                "import", parts[0].strip(), None, None, base,
                                parts[1].strip() if len(parts) > 1 else None,
                                ln, line, 0, len(line),
                            )
            else:
                ctor_cols: set[int] = set()
                if language == "Ruby":
                    la = _RB_LOCAL_ASSIGN.match(line)
                    if la:
                        local_types[la.group(1)] = la.group(2).split("::")[-1]
                    iv = _RB_IVAR_ASSIGN.match(line)
                    if iv:
                        ivar_types[iv.group(1)] = iv.group(2).split("::")[-1]
                    br = _RB_BARE_RHS.match(line)
                    if (
                        br
                        and br.group(1) not in local_names
                        and br.group(1) not in _KEYWORDS
                        and br.group(1) not in _RB_BARE_NOISE
                    ):
                        enc_rb = ".".join(scope_names()) or None
                        if enc_rb:
                            yield row(
                                "call", br.group(1), enc_rb, None, None, None,
                                ln, line, br.start(1), len(br.group(1)),
                            )
                    al = _RB_ANY_LOCAL.match(line)
                    if al:
                        local_names.add(al.group(1))
                    yield from receiver_calls(line, _RB_RECV_CALL, ln)
                elif language == "Python":
                    pla = _PY_LOCAL_ASSIGN.match(line)
                    if pla:
                        # constructor assignment types the local
                        # (python/analyzer.rs:218-387 resolved-call path)
                        local_types[pla.group(1)] = pla.group(2)
                    psa = _PY_SELF_ASSIGN.match(line)
                    if psa:
                        ivar_types[psa.group(1)] = psa.group(2)
                    # `super().m()` → the zero-arg super form is the spelled
                    # receiver `super` (tree-sitter sees a call node; the
                    # reference resolves it into the parent hierarchy like
                    # Java's `super.m()`); _normalize_nav inside
                    # receiver_calls collapses the parens offset-faithfully
                    yield from receiver_calls(line, _PY_RECV_CALL, ln)
                elif language == "TypeScript":
                    tla = _TS_LOCAL_ASSIGN.match(line)
                    if tla:
                        t = (tla.group(2) or tla.group(3)).split(".")[-1]
                        local_types[tla.group(1)] = t
                    tf = _TS_FIELD_TYPE.match(line)
                    if tf:
                        # class-frame guard: object-literal properties and
                        # multi-line function params (`  user: User,`) match
                        # the field shape but are NOT class fields — only a
                        # class/interface body types `this.x` receivers
                        f_indent = len(line) - len(line.lstrip())
                        host = next(
                            (f[2] for f in reversed(stack) if f[0] < f_indent),
                            None,
                        )
                        if host in ("class", "interface"):
                            ivar_types[tf.group(1)] = tf.group(2)
                    yield from receiver_calls(line, _TS_RECV_CALL, ln)
                    # `new Outer.Inner()` constructor calls: target is the
                    # class; cols recorded so the bare-call pass below does
                    # not double-emit the single-segment `new Token()` form
                    enc_ts = ".".join(scope_names()) or None
                    for nm_ in _JV_NEW.finditer(line):
                        cls = nm_.group(1).replace(" ", "").split(".")[-1]
                        col = nm_.end(1) - len(cls)
                        ctor_cols.add(col)
                        yield row(
                            "call", cls, enc_ts, None, None, None,
                            ln, line, col, len(cls),
                        )
                enclosing = ".".join(scope_names()) or None
                for cm in _CALL.finditer(line):
                    callee = cm.group(1)
                    if (
                        callee in _KEYWORDS
                        or callee in _CALL_NOISE
                        or cm.start(1) in ctor_cols
                    ):
                        continue
                    yield row(
                        "call", callee, enclosing, None, None, None,
                        ln, line, cm.start(1), len(callee),
                    )
        # ---- anonymous function definitions (Lambda/Proc) ------------------
        # scanned AFTER def processing so a lambda on a def line (`def f():
        # return lambda x: x`) nests under the def's freshly-pushed frame
        lam_hits = _lambda_hits(language, line)
        if lam_hits:
            # effective enclosing chain AT THIS LINE: a finished same-indent
            # sibling frame is no ancestor (a module-level `f = lambda: ...`
            # after a def used to inherit the def as parent) — keep frames
            # that are strictly shallower than this line's indent, plus any
            # frame opened ON this line (one-liner `def g(): return lambda`)
            _l_ind = len(line) - len(line.lstrip())
            _encl = [
                f[1]
                for f in stack
                if f[1] and (f[0] < _l_ind or (len(f) > 3 and f[3] == ln))
            ]
            if language in ("Java", "Kotlin"):
                _pfx = pkg if pkg else path.rsplit(".", 1)[0].replace("/", ".")
                _encl = _pfx.split(".") + _encl
            elif language == "CSharp" and pkg:
                _encl = pkg.split(".") + _encl
            base_chain = ".".join(_encl) or None
            open_lams: list[tuple[int, str]] = []  # same-line (col, name) nest stack
            for col, dtype in lam_hits:
                if language == "Python":
                    while open_lams and not _py_nested_same_line(
                        line, open_lams[-1][0], col
                    ):
                        open_lams.pop()
                else:
                    open_lams.clear()  # brace-language same-line nesting: siblings
                name = ("proc" if dtype == "Proc" else "lambda") + f"_{ln}_{col}"
                chain = ".".join(
                    ([base_chain] if base_chain else []) + [n for _, n in open_lams]
                ) or None
                yield row(
                    "definition", name, chain, dtype, None, None,
                    ln, line, col, len(name),
                )
                open_lams.append((col, name))
        byte_off += line_bytes
    # EOF closes every open frame: their definitions extend to the last line
    for _f in stack:
        if _f[3] is not None:
            spans.append((_f[1], _f[3], max(len(masked) - 1, _f[3])))


def _gitignore_pattern_regex(pat: str) -> str:
    """One .gitignore pattern → an RE2/Java-compatible anchored regex over the
    repo-relative path. Supported: `*` (segment glob), `?`, `**`, trailing `/`
    (directory contents), leading-`/` or embedded-`/` anchoring."""
    dir_only = pat.endswith("/")
    pat = pat.rstrip("/")
    anchored = pat.startswith("/") or "/" in pat
    pat = pat.lstrip("/")
    out = []
    i = 0
    while i < len(pat):
        if pat[i : i + 2] == "**":
            out.append(".*")
            i += 2
            continue
        c = pat[i]
        if c == "*":
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        else:
            out.append(re.escape(c))
        i += 1
    prefix = "^" if anchored else "(^|.*/)"
    suffix = "/.*$" if dir_only else "(/.*)?$"
    return prefix + "".join(out) + suffix


def gitignore_filter(df: DataFrame, patterns: list[str], path_col: str = "relative_path") -> DataFrame:
    """Apply .gitignore semantics (last matching pattern wins; `!` re-includes)
    as a fold of JVM-side rlike predicates — no Python UDF, so the filter
    stays inside the scan stage and prunes before any content is read.

    The reference walks with `ignore` crate semantics (project/source.rs);
    this covers the common pattern forms (see _gitignore_pattern_regex).
    """
    ignored = F.lit(False)
    # git semantics: a `!` negation cannot re-include a path whose parent
    # directory is excluded by an earlier dir-only pattern (`build/` then
    # `!build/keep.py` keeps keep.py ignored). Track ancestor exclusion as
    # the OR of dir-only positive patterns seen so far; remaining divergence
    # (a negated dir-only pattern un-excluding the dir for later patterns)
    # is not modeled.
    ancestor_excluded = F.lit(False)
    for raw in patterns:
        pat = raw.strip()
        if not pat or pat.startswith("#"):
            continue
        neg = pat.startswith("!")
        if neg:
            pat = pat[1:]
        dir_only = pat.endswith("/")
        rx = _gitignore_pattern_regex(pat)
        # wrap outward: the last pattern in file order is tested first =
        # last-match-wins
        match = F.col(path_col).rlike(rx)
        if neg:
            match = match & ~ancestor_excluded
        ignored = F.when(match, F.lit(not neg)).otherwise(ignored)
        if not neg and dir_only:
            ancestor_excluded = ancestor_excluded | F.col(path_col).rlike(rx)
    return df.filter(~ignored)


def load_gitignore(root: str) -> list[str]:
    """Read `{root}/.gitignore` if present (driver-side — it is one small
    file; the patterns ship to executors inside the plan, not as data)."""
    import os

    p = os.path.join(root, ".gitignore")
    if not os.path.exists(p):
        return []
    with open(p, encoding="utf-8", errors="replace") as fh:
        return fh.read().splitlines()


_FILE_META_SCHEMA = StructType(
    [
        StructField("relative_path", StringType(), False),
        StructField("extension", StringType(), False),
        StructField("language", StringType(), False),
        StructField("length", LongType(), False),
    ]
)

_FILE_SCHEMA = StructType(
    _FILE_META_SCHEMA.fields + [StructField("content", BinaryType(), True)]
)


def _walk_repo(root: str, max_file_size: int) -> list[tuple]:
    """S1 driver-side repo enumeration — metadata only, no content reads.

    Mirrors the reference's walkdir enumeration (project/source.rs:52-90,
    ``WalkBuilder.hidden(false)`` — dotfiles included, which also matters
    here because Spark's own file sources HIDE ``_``/``.``-prefixed names
    (a data-lake convention: ``_SUCCESS``, ``.crc``) and would silently drop
    every ``__init__.py`` in a Python repo. Ignored directory segments are
    pruned during the walk; the 5 MB cap (indexer.rs:64-71) is an
    ``os.stat`` metadata check, so oversized files are never opened.

    Scale note: enumeration is metadata-only and linear in file count —
    the same work ``git status`` does; content IO stays distributed."""
    import os

    rows = []
    rootp = root.rstrip("/")
    # The reference's executor marks a project Error when its root cannot be
    # enumerated (execution/executor.rs error path); os.walk on a missing dir
    # silently yields nothing, so probe explicitly and fail loudly.
    st = os.stat(rootp)  # raises FileNotFoundError / PermissionError
    import stat as _stat

    if not _stat.S_ISDIR(st.st_mode):
        raise NotADirectoryError(rootp)
    for dirpath, dirnames, filenames in os.walk(rootp):
        dirnames[:] = sorted(d for d in dirnames if d not in _IGNORED_SEGMENTS)
        for fn in sorted(filenames):
            ext = fn.rsplit(".", 1)[-1] if "." in fn else ""
            lang = LANGUAGE_BY_EXTENSION.get(ext)
            if lang is None:
                continue
            full = os.path.join(dirpath, fn)
            try:
                size = os.stat(full).st_size
            except OSError:
                continue
            if size > max_file_size:
                continue
            rows.append((os.path.relpath(full, rootp), ext, lang, int(size)))
    return rows


def list_files(
    spark: SparkSession, root: str, max_file_size: int = DEFAULT_MAX_FILE_SIZE
) -> DataFrame:
    """S1+S2: enumerate source files under ``root`` with size cap and ignore
    rules; returns (relative_path, extension, language, length, content).

    Enumeration is a driver-side metadata walk (see :func:`_walk_repo` for
    why Spark's binaryFile source cannot do this job: its hidden-file rule
    drops ``__init__.py``); gitignore filtering stays a Catalyst predicate
    over the path column; content IO is distributed — an Arrow-batched
    ``mapInPandas`` read, fusing the IO stage into the same batch pipeline
    that feeds per-file parsing (the reference's tokio-IO → rayon-parse
    split, indexer.rs:218-371)."""
    meta = spark.createDataFrame(_walk_repo(root, max_file_size), _FILE_META_SCHEMA)
    patterns = load_gitignore(root)
    if patterns:
        meta = gitignore_filter(meta, patterns)
    rootp = root.rstrip("/")

    def read_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        for pdf in batches:
            contents = []
            for rel in pdf["relative_path"]:
                try:
                    with open(os.path.join(rootp, rel), "rb") as fh:
                        contents.append(fh.read())
                except FileNotFoundError:
                    # raced deletion between enumeration and read → dropped
                    # below; any OTHER IO failure (permissions, executor
                    # without access to the path) must fail the job loudly
                    # rather than silently truncate the graph.
                    contents.append(None)
            yield pdf.assign(content=contents)

    par = max(spark.sparkContext.defaultParallelism, 1)
    out = meta.repartition(par).mapInPandas(read_batch, _FILE_SCHEMA)
    return out.filter(F.col("content").isNotNull())


def extract_entities(files: DataFrame) -> DataFrame:
    """D2: Arrow-batched per-file extraction via mapInPandas (the only Python
    hot path in the engine; everything downstream is Catalyst joins)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, lang, content in zip(
                pdf["relative_path"], pdf["language"], pdf["content"]
            ):
                try:
                    text = bytes(content).decode("utf-8", "replace")
                except Exception:
                    continue
                rows.extend(_extract_one(path, lang, text))
            yield pd.DataFrame(rows, columns=[f.name for f in ENTITY_SCHEMA])

    return files.select("relative_path", "language", "content").mapInPandas(
        run, ENTITY_SCHEMA
    )
