package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The per-pixel band-algebra front end (operator P1).
  *
  * The reference compiles the user's `calc` string with Python `exec` over
  * numpy band variables `A, B, C…` under masked semantics
  * (`gfw_pixetl/tiles/utils/array_utils.py:61-85`, band naming
  * `utils/utils.py:228-251`). Here the same grammar parses into a Catalyst
  * `Column` tree instead — no arbitrary code execution, and Catalyst gets to
  * constant-fold / codegen the expression. Masked values are `null`s:
  * Spark's null-propagating arithmetic matches numpy masked-array rules.
  *
  * Grammar (Python expression subset actually used by layer specs):
  *   or:   a | b          and:  a & b         xor: a ^ b
  *   cmp:  == != < <= > >=
  *   add:  a + b, a - b   mul:  a * b, a / b, a // b, a % b   pow: a ** b
  *   unary: -a, ~a, +a
  *   atoms: numbers, band vars A..Z, np.<fn>(...), (expr)
  *   multiband: np.ma.array([e1, e2, …]) → one Column per band
  */
object Calc {

  // ---------------------------------------------------------------- AST
  sealed trait Ast
  final case class Num(v: Double, isInt: Boolean) extends Ast
  final case class Var(name: String) extends Ast
  final case class Un(op: String, a: Ast) extends Ast
  final case class Bin(op: String, a: Ast, b: Ast) extends Ast
  final case class Call(fn: String, args: List[Ast]) extends Ast
  final case class Arr(items: List[Ast]) extends Ast

  // ---------------------------------------------------------------- Lexer
  private sealed trait Tok
  private case class TNum(v: Double, isInt: Boolean) extends Tok
  private case class TIdent(s: String) extends Tok
  private case class TOp(s: String) extends Tok
  private case object TEOF extends Tok

  private def lex(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val ops2 = Set("**", "//", "==", "!=", "<=", ">=")
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < s.length && s(i + 1).isDigit)) {
        val start = i
        while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' ||
          ((s(i) == '+' || s(i) == '-') && (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
        val text = s.substring(start, i)
        out += TNum(text.toDouble, !text.exists(ch => ch == '.' || ch == 'e' || ch == 'E'))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '.')) i += 1
        out += TIdent(s.substring(start, i))
      } else if (i + 1 < s.length && ops2.contains(s.substring(i, i + 2))) {
        out += TOp(s.substring(i, i + 2)); i += 2
      } else {
        out += TOp(c.toString); i += 1
      }
    }
    out += TEOF
    out.toList
  }

  // ------------------------------------------------------- Pratt parser
  final class Parser(tokens: List[Tok]) {
    private var toks = tokens
    private def peek: Tok = toks.head
    private def next(): Tok = { val t = toks.head; toks = toks.tail; t }
    private def expect(op: String): Unit = next() match {
      case TOp(`op`) => ()
      case t => throw new IllegalArgumentException(s"calc: expected '$op', got $t")
    }

    def parse(): Ast = {
      val e = orExpr()
      peek match {
        case TEOF => e
        case t    => throw new IllegalArgumentException(s"calc: trailing tokens at $t")
      }
    }

    private def orExpr(): Ast = {
      var a = xorExpr()
      while (peek == TOp("|")) { next(); a = Bin("|", a, xorExpr()) }
      a
    }
    private def xorExpr(): Ast = {
      var a = andExpr()
      while (peek == TOp("^")) { next(); a = Bin("^", a, andExpr()) }
      a
    }
    private def andExpr(): Ast = {
      var a = cmpExpr()
      while (peek == TOp("&")) { next(); a = Bin("&", a, cmpExpr()) }
      a
    }
    private def cmpExpr(): Ast = {
      var a = addExpr()
      var done = false
      while (!done) peek match {
        case TOp(op @ ("==" | "!=" | "<" | "<=" | ">" | ">=")) =>
          next(); a = Bin(op, a, addExpr())
        case _ => done = true
      }
      a
    }
    private def addExpr(): Ast = {
      var a = mulExpr()
      var done = false
      while (!done) peek match {
        case TOp(op @ ("+" | "-")) => next(); a = Bin(op, a, mulExpr())
        case _ => done = true
      }
      a
    }
    private def mulExpr(): Ast = {
      var a = unaryExpr()
      var done = false
      while (!done) peek match {
        case TOp(op @ ("*" | "/" | "//" | "%")) => next(); a = Bin(op, a, unaryExpr())
        case _ => done = true
      }
      a
    }
    private def unaryExpr(): Ast = peek match {
      case TOp("-") => next(); Un("-", unaryExpr())
      case TOp("+") => next(); unaryExpr()
      case TOp("~") => next(); Un("~", unaryExpr())
      case _        => powExpr()
    }
    private def powExpr(): Ast = {
      val base = atom()
      if (peek == TOp("**")) { next(); Bin("**", base, unaryExpr()) } // right-assoc
      else base
    }
    private def atom(): Ast = next() match {
      case TNum(v, isInt) => Num(v, isInt)
      case TIdent(name) =>
        if (peek == TOp("(")) {
          next()
          val args = scala.collection.mutable.ListBuffer.empty[Ast]
          if (peek != TOp(")")) {
            args += argExpr()
            while (peek == TOp(",")) { next(); args += argExpr() }
          }
          expect(")")
          Call(name, args.toList)
        } else Var(name)
      case TOp("(") =>
        val e = orExpr(); expect(")"); e
      case TOp("[") =>
        val items = scala.collection.mutable.ListBuffer.empty[Ast]
        if (peek != TOp("]")) {
          items += orExpr()
          while (peek == TOp(",")) { next(); items += orExpr() }
        }
        expect("]")
        Arr(items.toList)
      case t => throw new IllegalArgumentException(s"calc: unexpected token $t")
    }
    private def argExpr(): Ast = peek match {
      case TOp("[") => atom() // list literal argument (np.ma.array([...]))
      case _        => orExpr()
    }
  }

  def parse(calc: String): Ast = new Parser(lex(calc)).parse()

  // ---------------------------------------------------------- Compiler
  /** Compile a calc string to per-band Columns. `bands` maps variable name
    * (`A`, `B`, …) to its input Column. A top-level `np.ma.array([...])` /
    * `np.array([...])` yields one Column per output band; anything else one
    * band — mirroring the reshape+assert at `array_utils.py:74-85`. */
  def compile(calc: String, bands: Map[String, Column]): Seq[Column] =
    parse(calc) match {
      case Call(fn, List(Arr(items))) if isArrayCtor(fn) => items.map(c(_, bands))
      case Arr(items)                                    => items.map(c(_, bands))
      case ast                                           => Seq(c(ast, bands))
    }

  /** Single-band convenience. */
  def column(calc: String, bands: Map[String, Column]): Column = {
    val cols = compile(calc, bands)
    require(cols.length == 1, s"calc '$calc' produced ${cols.length} bands, expected 1")
    cols.head
  }

  private def isArrayCtor(fn: String): Boolean =
    fn == "np.ma.array" || fn == "np.array" || fn == "np.ma.stack" || fn == "np.stack"

  private def isCmp(op: String): Boolean =
    op == "==" || op == "!=" || op == "<" || op == "<=" || op == ">" || op == ">="

  private def c(ast: Ast, bands: Map[String, Column]): Column = ast match {
    case Num(v, isInt) => if (isInt) lit(v.toLong) else lit(v)
    case Var(name) =>
      bands.getOrElse(name,
        throw new IllegalArgumentException(
          s"calc references band '$name' but only ${bands.keys.toSeq.sorted.mkString(",")} exist"))
    case Un("-", a) => -c(a, bands)
    case Un("~", a) => // numpy ~ on booleans is logical not; on ints bitwise not
      val x = c(a, bands); when(x.isNull, lit(null)).otherwise(bitwise_not(x))
    case Un(op, _) => throw new IllegalArgumentException(s"calc: unknown unary $op")
    case Bin(op, a, b) =>
      val (x, y) = (c(a, bands), c(b, bands))
      op match {
        case "+"  => x + y
        case "-"  => x - y
        case "*"  => x * y
        case "/"  => x / y
        case "//" => floor(x / y).cast("long")
        case "%"  => x % y
        case "**" => pow(x, y)
        case "==" => x === y
        case "!=" => x =!= y
        case "<"  => x < y
        case "<=" => x <= y
        case ">"  => x > y
        case ">=" => x >= y
        // On booleans these are logical and/or/xor (the common calc usage,
        // e.g. `(A>0) & (B<5)`); Spark's and/or are null-propagating like
        // numpy masked logic.
        case "&" => x && y
        case "|" => x || y
        case "^" => x =!= y
        case o   => throw new IllegalArgumentException(s"calc: unknown op $o")
      }
    case Call(fn, args) => call(fn, args.map(c(_, bands)), args, bands)
    case Arr(_) => throw new IllegalArgumentException("calc: band list only allowed at top level")
  }

  private def call(fn: String, as: List[Column], raw: List[Ast], bands: Map[String, Column]): Column =
    (fn.stripPrefix("np.ma.").stripPrefix("np."), as) match {
      case ("where", List(cond, a, b))     => when(cond, a).otherwise(b)
      case ("log", List(a))                => log(a)
      case ("log2", List(a))               => log2(a)
      case ("log10", List(a))              => log10(a)
      case ("log1p", List(a))              => log1p(a)
      case ("sqrt", List(a))               => sqrt(a)
      case ("exp", List(a))                => exp(a)
      case ("abs" | "absolute", List(a))   => abs(a)
      case ("sin", List(a))                => sin(a)
      case ("cos", List(a))                => cos(a)
      case ("tan", List(a))                => tan(a)
      case ("arctan", List(a))             => atan(a)
      case ("arcsin", List(a))             => asin(a)
      case ("arccos", List(a))             => acos(a)
      case ("floor", List(a))              => floor(a)
      case ("ceil", List(a))               => ceil(a)
      case ("rint" | "round", List(a))     => round(a)
      case ("minimum", List(a, b))         => least(a, b)
      case ("maximum", List(a, b))         => greatest(a, b)
      case ("clip", List(a, lo, hi))       => least(greatest(a, lo), hi)
      case ("power", List(a, b))           => pow(a, b)
      case ("isnan", List(a))              => isnan(a)
      case ("logical_and", List(a, b))     => a && b
      case ("logical_or", List(a, b))      => a || b
      case ("logical_not", List(a))        => !a
      case ("invert", List(a))             => when(a.isNull, lit(null)).otherwise(bitwise_not(a))
      case ("masked_where", List(cond, a)) => when(cond, lit(null)).otherwise(a)
      case ("filled", List(a, v))          => coalesce(a, v)
      case ("nan_to_num", List(a))         => when(isnan(a), lit(0.0)).otherwise(a)
      // dtype constructors used as casts inside calc strings
      case ("uint8" | "uint16" | "uint32", List(a)) => a.cast("long")
      case ("int8", List(a))               => a.cast("byte")
      case ("int16", List(a))              => a.cast("short")
      case ("int32", List(a))              => a.cast("int")
      case ("int64", List(a))              => a.cast("long")
      case ("float16" | "float32", List(a)) => a.cast("float")
      case ("float64" | "float" | "double", List(a)) => a.cast("double")
      case ("bool_" | "bool", List(a))     => a.cast("boolean")
      case _ => throw new IllegalArgumentException(
        s"calc: unsupported function $fn/${as.length}")
    }
}
