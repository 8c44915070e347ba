PREFIX ex: <http://ex/>
DELETE DATA { GRAPH <http://ex/g1> { ex:x ex:v "1"^^<http://www.w3.org/2001/XMLSchema#integer> } }
