use std::collections::HashMap;
use std::fmt;

pub type NodeId = u64;

pub struct Graph {
    edges: HashMap<u64, Vec<u64>>,
}

pub enum Direction {
    Out,
    In,
}

pub trait Visit {
    fn visit(&self, node: u64);
}

impl Graph {
    pub fn new() -> Self {
        Graph { edges: HashMap::new() }
    }

    pub fn add_edge(&mut self, from: u64, to: u64) {
        self.edges.entry(from).or_default().push(to);
    }

    fn degree(&self, node: u64) -> usize {
        self.edges.get(&node).map_or(0, |v| v.len())
    }
}

impl fmt::Display for Graph {
    fn fmt(&self, f: &mut fmt::Formatter<'_>) -> fmt::Result {
        write!(f, "Graph({} nodes)", self.edges.len())
    }
}

pub fn components(graph: &Graph) -> usize {
    let mut seen = 0;
    for node in graph.edges.keys() {
        seen += usize::from(graph.degree(*node) > 0);
    }
    seen
}

macro_rules! trace_edge {
    ($e:expr) => { $e };
}

pub enum Edge {
    Weighted(u64, f64),
    Plain(u64),
}

// wave-8 shape: a multi-line raw string — its body (call-shaped mermaid
// text, a decl-shaped line) is string DATA, never mentions
pub fn mermaid_header() -> &'static str {
    r#"
graph TD
  start(["deploy(env)"])
fn ghost() {}
"#
}

/* wave-8c shape: rust block comments NEST — the whole span is dead
   /* inner */ and this line is STILL comment:
fn ghost_nested() {}
*/
